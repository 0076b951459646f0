"""Preprocessing CLI — one command per modality, like the reference mains.

Parity targets: ``src/data/audio.py:189-198``, ``src/data/skeleton.py:302-311``,
``src/data/text.py:574-585`` (each module doubles as a CLI via argparseNloop).

Usage:
  python -m mixstage_tpu.cli.preprocess -modalities '["audio"]' \
      -path2data <raw> -path2outdata <out> -speaker '["all"]' \
      -preprocess_methods '["log_mel_512"]'
"""

from __future__ import annotations

from mixstage_tpu.config import Config, argparse_n_loop
from mixstage_tpu.data.audio import Audio
from mixstage_tpu.data.skeleton import Skeleton2D
from mixstage_tpu.data.text import Text

MODALITY_MAP = {"audio": Audio, "pose": Skeleton2D, "skeleton": Skeleton2D,
                "text": Text}


def loop(args: Config, exp_num: int):
    modalities = args.modalities if isinstance(args.modalities, list) \
        else [args.modalities]
    for modality in modalities:
        kind = modality.split("/")[0]
        cls = MODALITY_MAP[kind]
        methods = args.preprocess_methods
        if kind in ("pose", "skeleton") and isinstance(methods, list):
            methods = methods[0]
        speaker = args.speaker if isinstance(args.speaker, list) \
            else [args.speaker]
        extra = {"text_aligned": args.text_aligned} if kind == "text" else {}
        mod = cls(path2data=args.path2data, path2outdata=args.path2outdata,
                  speaker=speaker, preprocess_methods=methods, **extra)
        mod.preprocess()
        print(f"{modality} preprocessing done")


def main():
    argparse_n_loop(loop)


if __name__ == "__main__":
    main()
