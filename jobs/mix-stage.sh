# Canonical Mix-StAGE training commands (parity with reference src/jobs/mix-stage.py,
# model hyperparameters identical; entry point is the mixstage_tpu train CLI).

# Speaker Level Style
## 2-speaker
python -m mixstage_tpu.cli.train -cpk JointLateClusterSoftStyle4_G -tb 1 -exp 1 -speaker '["corden", "lec_cosmic"]' -model JointLateClusterSoftStyle4_G -modelKwargs '{"lambda_id": 0.1, "argmax": 1, "some_grad_flag": 1, "train_only": 1}' -note mix-stage -save_dir save/mix-stage -modalities '["pose/normalize", "audio/log_mel_400"]' -fs_new '[15, 15]' -input_modalities '["audio/log_mel_400"]' -output_modalities '["pose/normalize"]' -gan 1 -loss L1Loss -window_hop 5 -render 0 -batch_size 16 -num_epochs 20 -stop_thresh 3 -overfit 0 -early_stopping 0 -dev_key dev_spatialNorm -num_clusters 8 -feats '["pose", "velocity", "speed"]' -style_iters 3000 -num_iters 3000 -no_grad 0

## 4-speaker
python -m mixstage_tpu.cli.train -cpk JointLateClusterSoftStyle4_G -tb 1 -exp 1 -speaker '["corden", "lec_cosmic", "ytch_prof", "oliver"]' -model JointLateClusterSoftStyle4_G -modelKwargs '{"lambda_id": 0.1, "argmax": 1, "some_grad_flag": 1, "train_only": 1}' -note mix-stage -save_dir save/mix-stage -modalities '["pose/normalize", "audio/log_mel_400"]' -fs_new '[15, 15]' -input_modalities '["audio/log_mel_400"]' -output_modalities '["pose/normalize"]' -gan 1 -loss L1Loss -window_hop 5 -render 0 -batch_size 16 -num_epochs 20 -stop_thresh 3 -overfit 0 -early_stopping 0 -dev_key dev_spatialNorm -num_clusters 8 -feats '["pose", "velocity", "speed"]' -style_iters 3000 -num_iters 3000 -no_grad 0

## 8-speaker
python -m mixstage_tpu.cli.train -cpk JointLateClusterSoftStyle4_G -tb 1 -exp 1 -speaker '["corden", "lec_cosmic", "ytch_prof", "oliver", "ellen", "noah", "lec_evol", "maher"]' -model JointLateClusterSoftStyle4_G -modelKwargs '{"lambda_id": 0.1, "argmax": 1, "some_grad_flag": 1, "train_only": 1}' -note mix-stage -save_dir save/mix-stage -modalities '["pose/normalize", "audio/log_mel_400"]' -fs_new '[15, 15]' -input_modalities '["audio/log_mel_400"]' -output_modalities '["pose/normalize"]' -gan 1 -loss L1Loss -window_hop 5 -render 0 -batch_size 16 -num_epochs 20 -stop_thresh 3 -overfit 0 -early_stopping 0 -dev_key dev_spatialNorm -num_clusters 8 -feats '["pose", "velocity", "speed"]' -style_iters 3000 -num_iters 3000 -no_grad 0

# Attribute Level Style (sit/stand, gesture frequency, orientation, dominant arm)
python -m mixstage_tpu.cli.train -cpk mix-stage -tb 1 -exp 1 -speaker '["noah", "maher"]' -modelKwargs '{"lambda_id": 0.1, "argmax": 1, "some_grad_flag": 1, "train_only": 1}' -note mix-stage -save_dir save/mix-stage -model JointLateClusterSoftStyle4_G -modalities '["pose/normalize", "audio/log_mel_400"]' -fs_new '[15, 15]' -input_modalities '["audio/log_mel_400"]' -output_modalities '["pose/normalize"]' -gan 1 -loss L1Loss -window_hop 5 -render 0 -batch_size 16 -num_epochs 20 -stop_thresh 3 -overfit 0 -early_stopping 0 -dev_key dev_spatialNorm -num_clusters 8 -feats '["pose", "velocity", "speed"]' -style_iters 3000 -num_iters 3000 -no_grad 0
python -m mixstage_tpu.cli.train -cpk mix-stage -tb 1 -exp 1 -speaker '["seth", "oliver"]' -modelKwargs '{"lambda_id": 0.1, "argmax": 1, "some_grad_flag": 1, "train_only": 1}' -note mix-stage -save_dir save/mix-stage -model JointLateClusterSoftStyle4_G -modalities '["pose/normalize", "audio/log_mel_400"]' -fs_new '[15, 15]' -input_modalities '["audio/log_mel_400"]' -output_modalities '["pose/normalize"]' -gan 1 -loss L1Loss -window_hop 5 -render 0 -batch_size 16 -num_epochs 20 -stop_thresh 3 -overfit 0 -early_stopping 0 -dev_key dev_spatialNorm -num_clusters 8 -feats '["pose", "velocity", "speed"]' -style_iters 3000 -num_iters 3000 -no_grad 0
python -m mixstage_tpu.cli.train -cpk mix-stage -tb 1 -exp 1 -speaker '["chemistry", "lec_evol"]' -modelKwargs '{"lambda_id": 0.1, "argmax": 1, "some_grad_flag": 1, "train_only": 1}' -note mix-stage -save_dir save/mix-stage -model JointLateClusterSoftStyle4_G -modalities '["pose/normalize", "audio/log_mel_400"]' -fs_new '[15, 15]' -input_modalities '["audio/log_mel_400"]' -output_modalities '["pose/normalize"]' -gan 1 -loss L1Loss -window_hop 5 -render 0 -batch_size 16 -num_epochs 20 -stop_thresh 3 -overfit 0 -early_stopping 0 -dev_key dev_spatialNorm -num_clusters 8 -feats '["pose", "velocity", "speed"]' -style_iters 3000 -num_iters 3000 -no_grad 0
python -m mixstage_tpu.cli.train -cpk mix-stage -tb 1 -exp 1 -speaker '["lec_cosmic|leftarm", "lec_cosmic|rightarm"]' -modelKwargs '{"lambda_id": 0.1, "argmax": 1, "some_grad_flag": 1, "train_only": 1}' -note mix-stage -save_dir save/mix-stage -model JointLateClusterSoftStyle4_G -modalities '["pose/normalize", "audio/log_mel_400"]' -fs_new '[15, 15]' -input_modalities '["audio/log_mel_400"]' -output_modalities '["pose/normalize"]' -gan 1 -loss L1Loss -window_hop 5 -render 0 -batch_size 16 -num_epochs 20 -stop_thresh 3 -overfit 0 -early_stopping 0 -dev_key dev_spatialNorm -num_clusters 8 -feats '["pose", "velocity", "speed"]' -style_iters 3000 -num_iters 3000 -no_grad 0

# TPU speed knobs (optional; -scan_steps keeps SGD semantics exactly):
#   -scan_steps 64        fuse 64 train steps per dispatch (k=64 measured
#                         fastest on v5e; see BASELINE.md)
#   -dtype bfloat16       bf16 compute, f32 params + Adam.  Measured training
#                         parity (200 interleaved G/D steps vs f32, synthetic
#                         fixture — BASELINE.md "bf16 training"): mean loss
#                         level within 0.8%, end-state PCK Δ0.9% /
#                         spatialNorm Δ1.4%; CI-pinned by tests/test_steps.py
#                         ::test_bf16_training_dynamics_bound
#   -ckpt_backend orbax   atomic checkpoints incl. optimizer state
# Append to any command above, e.g.: ... -scan_steps 64 -dtype bfloat16
