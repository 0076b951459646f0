"""Sample CLI — restore a checkpointed experiment and run the sample loop.

Parity target: reference ``src/sample.py:7-31`` (args restored from the
checkpoint's ``_args.args``; rebuilt with ``window_hop: 0``).
"""

from __future__ import annotations

from mixstage_tpu.config import Config, argparse_n_loop
from mixstage_tpu.train.trainer import Trainer


def loop(args: Config, exp_num: int):
    assert args.load, "pass -load <PREFIX_weights.p>"
    args_subset = ["exp", "cpk", "speaker", "model", "note"]
    # explicit CLI flags survive the checkpoint-args restore
    # (reference sample.py:10: get_args_update_dict)
    from mixstage_tpu.config import get_args_update_dict

    update = get_args_update_dict(args)
    update["window_hop"] = 0
    trainer = Trainer(args, args_subset, update)
    trainer.book._set_seed()
    trainer.sample(exp_num)
    trainer.finish_exp()


def main():
    argparse_n_loop(loop)


if __name__ == "__main__":
    main()
