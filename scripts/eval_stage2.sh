#!/bin/bash
# Stage-2 eval on AMASS test (mirror of scripts/eval_stage2.sh)
python -m egoego_release_tpu.eval.eval_stage2 \
    --test_data_path data/amass_same_shape_egoego_processed/test_amass_smplh_motion.p \
    --stats_path data/amass_same_shape_egoego_processed/cano_min_max_mean_std_data_window_120.p \
    --checkpoint pretrained_models/stage2_diffusion_4.pt \
    --smplh_path smpl_models/smplh_amass "$@"
