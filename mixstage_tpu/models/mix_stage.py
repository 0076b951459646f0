"""Mix-StAGE: conditional mixture-of-generators with speaker style.

Parity target: ``JointLateClusterSoftStyle4_G`` (reference
``/root/reference/src/model/joint_late_cluster_soft_style.py:17-209``) — the
paper's model: audio/text (or curriculum pose) content encoding → UNet →
style-embedding concat → cluster classifier soft attention → grouped-conv
mixture decoder → soft output selection.

TPU-first re-design decisions:

* The pose-style encoder is a **separate component**
  (``mixstage_tpu.models.layers.PoseStyleEncoder``) applied by the train step,
  so the ``some_grad`` trick (jlcss4.py:199-200) becomes a plain
  ``jax.lax.stop_gradient`` on its param subtree — no module-state games.
* The style table is always applied in soft-matmul mode with explicit
  ``style_weights`` (B, T, num_speakers); hard 'emb' indexing is the special
  case of one-hot weights (EmbLin modes, layers.py:659-663), which unifies the
  training / sampling / style-transfer graphs into one jittable function.
* The curriculum pose-vs-audio input coin (jlcss4.py:127-129) is flipped on the
  host (exactly like the reference's ``torch.rand(1).item()``) and passed as a
  static flag, producing two compiled variants instead of a traced branch —
  the unselected encoder neither runs nor updates its batch-norm stats.
* Dead submodules of the reference (``style_dec``/``style_dec_gr``,
  ``smoothen``, ``eye`` — created but never used in forward) are not created.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mixstage_tpu.models.layers import (AudioEncoder, ClusterClassify,
                                        ConvNormRelu, EmbLin,
                                        GroupedPointwiseConv, PoseEncoder,
                                        TextEncoder1D, UNet1D)
from mixstage_tpu.ops.mixture import index_select_outputs

Dtype = Any


class JointLateClusterSoftStyle4_G(nn.Module):
    """Mix-StAGE generator (content + style → soft mixture of M decoders)."""

    time_steps: int = 64
    in_channels: int = 256
    out_feats: int = 96
    num_clusters: int = 8
    num_speakers: int = 2
    style_dim: int = 10
    text_channels: Optional[int] = None  # 300 (w2v) or 768 (bert) when text is used
    p: float = 0.0
    # 'conv' (default) or 'einsum': lowering of the grouped mixture-decoder
    # convs.  'einsum' is parameter- and math-identical but partitions
    # cleanly under expert-parallel sharding (layers._GroupedConv1DEinsum)
    decoder_lowering: str = "conv"
    # per-layer TPU relowering plan for the audio conv pyramid (conv0..conv7,
    # each 'conv' | 's2d' | 'im2col'); exact math, same params — see
    # layers.AudioEncoder.lowerings.  None = native convs.
    audio_lowerings: Optional[Tuple[str, ...]] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        common = dict(p=self.p, dtype=self.dtype, param_dtype=self.param_dtype)
        self.audio_encoder = AudioEncoder(output_feats=self.time_steps,
                                          lowerings=self.audio_lowerings,
                                          **common)
        self.text_encoder = TextEncoder1D(
            output_feats=self.time_steps,
            input_channels=self.text_channels if self.text_channels else 300,
            **common)
        self.pose_encoder = PoseEncoder(output_feats=self.time_steps,
                                        input_channels=self.out_feats, **common)
        self.unet = UNet1D(self.in_channels, self.in_channels, groups=1, **common)
        self.style_emb = EmbLin(num_embeddings=self.num_speakers,
                                embedding_dim=self.style_dim,
                                dtype=self.dtype, param_dtype=self.param_dtype)
        # content mixture decoder: 4 grouped ConvNormRelu + grouped 1x1 logits
        # (jlcss4.py:69-83)
        self.decoder = [
            ConvNormRelu(self.style_dim + self.in_channels, self.in_channels,
                         type="1d", leaky=True, groups=self.num_clusters,
                         lowering=self.decoder_lowering,
                         name=f"decoder0", **common)
        ] + [
            ConvNormRelu(self.in_channels, self.in_channels, type="1d",
                         leaky=True, groups=self.num_clusters,
                         lowering=self.decoder_lowering,
                         name=f"decoder{i + 1}", **common)
            for i in range(3)
        ]
        # grouped 1x1 output head as an explicit per-group matmul (same
        # params as the conv form; see GroupedPointwiseConv for why)
        self.logits = GroupedPointwiseConv(
            features=self.out_feats * self.num_clusters,
            groups=self.num_clusters,
            dtype=self.dtype, param_dtype=self.param_dtype)
        self.concat_encoder = ConvNormRelu(512, 256, type="1d", leaky=True, **common)
        self.classify_cluster = ClusterClassify(
            num_clusters=self.num_clusters, groups=1,
            input_channels=self.style_dim + self.in_channels, **common)

    def encode_content(self, x_list: Sequence[jnp.ndarray], y,
                       input_modalities: Sequence[str],
                       use_pose_input: bool, time_steps: int, train: bool):
        """Curriculum content encoding (jlcss4.py:127-142)."""
        build_all = self.is_initializing()
        content = None
        if use_pose_input or build_all:
            content = self.pose_encoder(y, train=train)
        if (not use_pose_input) or build_all:
            encoded: List[jnp.ndarray] = []
            for i, modality in enumerate(input_modalities):
                kind = modality.split("/")[0]
                if kind == "text":
                    encoded.append(self.text_encoder(x_list[i], train=train))
                elif kind == "audio":
                    encoded.append(self.audio_encoder(x_list[i],
                                                      time_steps=time_steps,
                                                      train=train))
                else:
                    raise ValueError(f"unknown input modality {modality!r}")
            if len(encoded) >= 2:
                cat = jnp.concatenate(encoded, axis=-1)
                fused = self.concat_encoder(cat, train=train)
            else:
                fused = encoded[0]
                if build_all:
                    # build concat_encoder params even in audio-only configs so
                    # checkpoints are config-independent on the text axis
                    _ = self.concat_encoder(jnp.concatenate([fused, fused], -1),
                                            train=train)
            if not use_pose_input:
                content = fused
        return content

    def features(self, x_list: Sequence[jnp.ndarray], y, style_weights,
                 input_modalities: Sequence[str],
                 use_pose_input: bool = False,
                 time_steps: Optional[int] = None,
                 train: bool = True):
        """Content encoding → UNet → style concat: the shared (B, T,
        256+style_dim) features feeding both the cluster classifier and the
        mixture decoder.  Exposed for the serving fast path
        (``mixstage_tpu/serve.py``)."""
        # time_steps=None lets the audio encoder resize to its own input
        # length — the sampling path runs whole intervals as one sequence
        # (reference trainer.py:778-786 / layers.py:191-197)
        x = self.encode_content(x_list, y, input_modalities, use_pose_input,
                                time_steps, train)
        x = self.unet(x, train=train)
        labels_style = self.style_emb(style_weights, mode="lin")  # (B, T, style_dim)
        return jnp.concatenate([x, labels_style], axis=-1)        # (B, T, 256+style_dim)

    def backbone(self, x_list: Sequence[jnp.ndarray], y, style_weights,
                 input_modalities: Sequence[str],
                 use_pose_input: bool = False,
                 time_steps: Optional[int] = None,
                 train: bool = True):
        """Everything up to (excluding) the mixture decoder."""
        x = self.features(x_list, y, style_weights, input_modalities,
                          use_pose_input, time_steps, train)
        labels_score = self.classify_cluster(x, train=train)      # (B, T, M)
        labels_cap_soft = nn.softmax(labels_score, axis=-1)
        return x, labels_score, labels_cap_soft

    def __call__(self, x_list: Sequence[jnp.ndarray], y, style_weights,
                 input_modalities: Sequence[str],
                 use_pose_input: bool = False,
                 time_steps: Optional[int] = None,
                 train: bool = True) -> Dict[str, jnp.ndarray]:
        """Forward pass.

        Args:
          x_list: input modality arrays (audio (B, T, mel), text (B, T, emb));
            cluster labels are NOT included (the step function keeps them).
          y: (B, T, out_feats) target pose (used by the curriculum pose branch).
          style_weights: (B, T, num_speakers) soft speaker weights; one-hot for
            hard style ids (sampling / style transfer).
          use_pose_input: curriculum coin (host-flipped, static).

        Returns dict with 'pose' (B, T, out_feats), 'labels_score' and
        'labels_cap_soft' (B, T, M).
        """
        x, labels_score, labels_cap_soft = self.backbone(
            x_list, y, style_weights, input_modalities, use_pose_input,
            time_steps, train)

        # replicate the fused content M times and run the grouped mixture
        # decoder as one conv (jlcss4.py:190-193)
        xr = jnp.tile(x, (1, 1, self.num_clusters))
        for layer in self.decoder:
            xr = layer(xr, train=train)
        xr = self.logits(xr)                                      # (B, T, M*out_feats)
        pose = index_select_outputs(xr, labels_cap_soft, self.num_clusters)

        return {"pose": pose, "labels_score": labels_score,
                "labels_cap_soft": labels_cap_soft}


# The reference aliases the discriminator (jlcss4.py:15)
from mixstage_tpu.models.speech2gesture import Speech2Gesture_D  # noqa: E402

JointLateClusterSoftStyle4_D = Speech2Gesture_D
