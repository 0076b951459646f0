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
    trainer = Trainer(args, args_subset, {"window_hop": 0})
    trainer.book._set_seed()
    trainer.sample(exp_num)
    trainer.finish_exp()


def main():
    argparse_n_loop(loop)


if __name__ == "__main__":
    main()
