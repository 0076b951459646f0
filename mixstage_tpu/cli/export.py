"""Export CLI — restore a checkpointed experiment and write an AOT serving
artifact (StableHLO + folded weights; see mixstage_tpu/export.py).

TPU-native addition (no reference counterpart — the reference deploys by
shipping its pickled torch checkpoint plus the whole model source tree).

  python -m mixstage_tpu.cli.export -load <PREFIX_weights.p> \
      -path2data <data> -export_dir out/artifact [-export_variants xla,pallas]

The artifact serves with ``mixstage_tpu.export.load_serving`` or directly via
``python -m mixstage_tpu.cli.serve -export_dir out/artifact``.
"""

from __future__ import annotations

import json

from mixstage_tpu.config import Config, argparse_n_loop


def loop(args: Config, exp_num: int):
    assert args.load, "pass -load <PREFIX_weights.p>"
    assert args.export_dir, "pass -export_dir <output directory>"
    from mixstage_tpu.config import get_args_update_dict
    from mixstage_tpu.export import export_serving
    from mixstage_tpu.train.trainer import Trainer

    update = get_args_update_dict(args)
    update["window_hop"] = 0
    update["render"] = 0
    trainer = Trainer(args, ["exp", "cpk", "speaker", "model", "note"],
                      update)
    variants = tuple(v.strip() for v in args.export_variants.split(",")
                     if v.strip())
    manifest = export_serving(
        trainer.factory, trainer.state, args.export_dir,
        batch=int(trainer.args.batch_size or 32), variants=variants)
    print(json.dumps({"export_dir": args.export_dir,
                      "variants": sorted(manifest["variants"]),
                      "batch": manifest["batch"],
                      "frames": manifest["frames"]}), flush=True)


def main():
    argparse_n_loop(loop)


if __name__ == "__main__":
    main()
