"""Reference (torch) checkpoint → mixstage_tpu parameter trees.

The reference saves ``model.state_dict()`` via pycasper into
``PREFIX_weights.p`` (torch pickle / zip archive); for GAN trainers the
saved module is the GAN wrapper, so keys carry ``G.``/``D.`` prefixes
(reference ``src/model/trainer.py:1041-1087``, ``gan.py``), while non-GAN
trainers save the generator's keys unprefixed (``trainer.py:917-968``).

This module converts such a state_dict into this framework's checkpoint
trees ``{g_params, g_state, d_params, d_state}`` by walking OUR template
tree (built by ``StepFactory.init``) and renaming every leaf path to its
torch key — so conversion fails loudly if the torch file lacks anything
the flax model needs, and reports reference-only branches it skipped
(``text_encoder``/``style_dec``/momentum counters live in the reference
state_dict even when the forward path never uses them).

Weight layout translation (channels-last flax vs torch):
  conv1d  torch (Cout, Cin/groups, K)     → flax (K, Cin/groups, Cout)
  conv2d  torch (Cout, Cin, Kh, Kw)       → flax (Kh, Kw, Cin, Cout)
  linear  torch (Cout, Cin)               → flax (Cin, Cout)
  batch-norm weight/bias/running_{mean,var} → scale/bias/mean/var (copy)

The same renaming covers every model family because the flax module names
were chosen 1:1 against the reference modules (see tests/test_torch_parity.py
for the hand-written equivalent this file replaces with a rule table).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

# flax-path → torch-key renames, applied to the '/'-joined path WITHIN one
# tree ('gen', 'psenc' or the discriminator).  First match wins; the match
# is substituted and the remainder handled by the leaf rules below.
_GEN_RULES: List[Tuple[str, str]] = [
    (r"^unet/pre(\d+)/", r"unet.pre_downsampling_conv.\1."),
    (r"^unet/down(\d+)/", r"unet.conv1.\1."),
    (r"^unet/up(\d+)/", r"unet.conv2.\1."),
    (r"^decoder(\d+)/", r"decoder.\1."),
    (r"^(audio_encoder|text_encoder)/conv(\d+)/", r"\1.conv.\2."),
    (r"^(classify_cluster|pose_encoder)/stack/conv(\d+)/", r"\1.conv.\2."),
    (r"^classify_cluster/logits/", r"classify_cluster.logits."),
    (r"^style_emb/embedding$", r"style_emb.emb.weight"),
    # single ConvNormRelu stored inside an nn.Sequential in the reference
    (r"^concat_encoder/", r"concat_encoder.0."),
    (r"^smoothen/", r"smoothen."),
    # StyleClassifier_G stack (style_classifier.py:19-26; its nn.Sequential
    # duplicates the same modules under 'model.N' — skipped as aliases)
    (r"^classifier(\d+)/", r"classifier.\1."),
]

_PSENC_RULES: List[Tuple[str, str]] = [
    (r"^stack/conv(\d+)/", r"pose_style_encoder.conv.\1."),
]

_DISC_RULES: List[Tuple[str, str]] = [
    # reference D.conv1 is nn.Sequential(conv, leaky) (speech2gesture.py)
    (r"^conv1/", r"conv1.0."),
    (r"^conv2_0/", r"conv2.0."),
]

# leaf renames (suffix of the path after module renaming)
_LEAF_RULES: List[Tuple[str, str]] = [
    (r"conv/kernel$", "conv.weight"),
    (r"conv/bias$", "conv.bias"),
    (r"norm/scale$", "norm.weight"),
    (r"norm/bias$", "norm.bias"),
    (r"norm/mean$", "norm.running_mean"),
    (r"norm/var$", "norm.running_var"),
    (r"(^|/)kernel$", r"\1weight"),
    (r"embedding$", "embedding"),  # already fully renamed by module rule
]


def sniff_torch_file(path: str) -> bool:
    """True when ``path`` is a torch checkpoint (zip archive or pickle)
    rather than a flax msgpack blob.  torch.save's modern format is a zip
    (magic ``PK\\x03\\x04``); its legacy format is a pickle stream (first
    byte ``\\x80``).  msgpack maps/arrays never start with either byte."""
    try:
        with open(path, "rb") as f:
            magic = f.read(4)
    except (OSError, IsADirectoryError):
        return False
    return magic[:2] == b"PK" or (len(magic) > 0 and magic[0] == 0x80)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``PREFIX_weights.p`` into {key: float numpy array}.

    Requires torch (CPU build is enough).  Non-tensor entries are dropped;
    the reference trains in fp64 (``trainer.py:138``) so values are
    downcast later, against the template leaf's dtype."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is baked in here
        raise ImportError(
            "importing a reference torch checkpoint requires torch; "
            "install the CPU build or convert the file elsewhere") from e
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        sd = torch.load(path, map_location="cpu")
    out = {}
    for key, val in sd.items():
        if hasattr(val, "detach"):
            out[key] = val.detach().cpu().numpy()
    return out


def _rename(path: str, rules: List[Tuple[str, str]]) -> str:
    # leaf rules first: they key on the flax '/'-separated suffix, which the
    # module rules below rewrite into torch's '.'-separated form
    for pat, repl in _LEAF_RULES:
        new, n = re.subn(pat, repl, path)
        if n:
            path = new
            break
    for pat, repl in rules:
        new, n = re.subn(pat, repl, path)
        if n:
            path = new
    return path.replace("/", ".")


def _to_flax(arr: np.ndarray, template_leaf: Any, torch_key: str,
             flax_path: str = "") -> np.ndarray:
    """Torch layout → flax layout for one leaf, shape-checked."""
    tshape = tuple(np.shape(template_leaf))
    if torch_key.endswith(("weight",)) and arr.ndim == 3 \
            and not torch_key.endswith(("norm.weight", "emb.weight")):
        arr = arr.transpose(2, 1, 0)
    elif torch_key.endswith("weight") and arr.ndim == 4:
        arr = arr.transpose(2, 3, 1, 0)
    elif torch_key.endswith("weight") and arr.ndim == 2 \
            and flax_path.endswith("kernel"):
        # linear layer: torch (Cout, Cin) → flax Dense (Cin, Cout).  Decide
        # by the template leaf's ROLE (a flax 'kernel'), never by shape —
        # a shape test silently skips the transpose on square Cin == Cout
        # matrices (self-review r4)
        arr = arr.T
    if arr.shape != tshape:
        raise ValueError(
            f"shape mismatch importing '{torch_key}': torch {arr.shape} "
            f"(after layout transpose) vs flax template {tshape}")
    dtype = getattr(template_leaf, "dtype", np.dtype(np.float32))
    return np.ascontiguousarray(arr.astype(dtype))


def _fill_tree(template: Any, sd: Dict[str, np.ndarray], prefix: str,
               rules: List[Tuple[str, str]], used: set,
               missing: List[str], path: str = "") -> Any:
    if isinstance(template, dict):
        return {k: _fill_tree(v, sd, prefix, rules, used, missing,
                              f"{path}/{k}" if path else k)
                for k, v in template.items()}
    torch_key = prefix + _rename(path, rules)
    if torch_key not in sd:
        missing.append(f"{path} (expected torch key '{torch_key}')")
        return template
    used.add(torch_key)
    return _to_flax(sd[torch_key], template, torch_key, flax_path=path)


def convert_reference_checkpoint(
        sd: Dict[str, np.ndarray],
        template: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a reference state_dict into ``template``-shaped trees.

    ``template`` is the ``{g_params, g_state, d_params, d_state}`` dict the
    BookKeeper checkpoints (values as built by ``StepFactory.init``).
    Returns ``(converted, report)`` where report lists skipped reference
    keys; raises ``ValueError`` when a template leaf has no source key.
    """
    gan_style = any(k.startswith("G.") for k in sd)
    gp = "G." if gan_style else ""
    used: set = set()
    missing: List[str] = []
    out: Dict[str, Any] = {}

    for part, key in (("g_params", "params"), ("g_state", "stats")):
        tree = template.get(part) or {}
        conv = {}
        for sub, subtree in tree.items():
            rules = _PSENC_RULES if sub == "psenc" else _GEN_RULES
            conv[sub] = _fill_tree(subtree, sd, gp, rules, used, missing)
        out[part] = conv
    for part in ("d_params", "d_state"):
        tree = template.get(part)
        if not tree:
            out[part] = tree
            continue
        if not gan_style and not any(k.startswith("D.") for k in sd):
            # reference non-GAN checkpoints carry no discriminator — keep
            # the freshly initialised one (matches reference -gan 0 resume)
            out[part] = tree
            continue
        out[part] = _fill_tree(tree, sd, "D.", _DISC_RULES, used, missing)

    if missing:
        raise ValueError(
            "reference checkpoint is missing weights for "
            f"{len(missing)} flax leaves; first few: {missing[:5]}. "
            "Is the checkpoint from the same -model/-modelKwargs?")

    skipped = sorted(k for k in sd if k not in used)
    # momentum counters and unused reference branches are expected noise
    expected = re.compile(
        r"num_batches_tracked$|^(G\.)?(eye|thresh)|"
        r"^(G\.)?(style_dec|style_dec_gr|text_encoder|pose_encoder|"
        r"concat_encoder|smoothen|concat_encoder2|model)\.")
    surprising = [k for k in skipped if not expected.search(k)]
    report = {"n_converted": len(used), "n_skipped": len(skipped),
              "skipped": skipped, "surprising_skipped": surprising}
    return out, report
