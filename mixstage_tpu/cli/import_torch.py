"""Import a REFERENCE (chahuja/mix-stage, pytorch) checkpoint.

Converts a pycasper ``PREFIX_weights.p`` (a pickled ``model.state_dict()``,
reference ``src/model/trainer.py:142-148``) into this framework's native
checkpoint format, writing a standalone experiment directory::

    python -m mixstage_tpu.cli.import_torch \
        -load /ref/save/exp_XX_..._weights.p -path2data <pats> \
        -out_dir save/imported

Experiment args are restored from the reference's adjacent ``_args.args``
file (same contract as the sample CLI); explicit CLI flags override them.
The conversion itself lives in ``mixstage_tpu/interop/torch_import.py`` and
also runs transparently whenever any CLI gets ``-load <torch file>`` — this
command just persists the converted weights so later runs skip torch.
"""

from __future__ import annotations

import os

from mixstage_tpu.config import Config, argparse_n_loop, get_args_update_dict
from mixstage_tpu.train.trainer import Trainer


def loop(args: Config, exp_num: int):
    assert args.load, "pass -load <reference PREFIX_weights.p>"
    from mixstage_tpu.interop.torch_import import sniff_torch_file
    assert sniff_torch_file(args.load), (
        f"{args.load} is not a torch checkpoint; native checkpoints need no "
        "import")
    out_dir = args.out_dir or os.path.join(args.save_dir or "save",
                                           "imported")
    args_subset = ["exp", "cpk", "speaker", "model", "note"]
    update = get_args_update_dict(args)
    update["window_hop"] = 0  # template only; no training windows needed
    # Trainer ctor runs BookKeeper._load_model, which detects the torch
    # format and converts the state_dict into the template trees
    trainer = Trainer(args, args_subset, update)
    path = trainer.book.export_experiment(trainer.state, out_dir)
    trainer.book.log(f"imported reference checkpoint → {path}")
    trainer.finish_exp()


def main():
    argparse_n_loop(loop)


if __name__ == "__main__":
    main()
