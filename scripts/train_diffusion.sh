#!/bin/bash
# Stage-2 diffusion training (mirror of scripts/train_cond_motion_diffusion.sh)
python -m egoego_release_tpu.training.train_diffusion \
    --train_data_path data/amass_same_shape_egoego_processed/train_amass_smplh_motion.p \
    --set data.stats_path=data/amass_same_shape_egoego_processed/cano_min_max_mean_std_data_window_120.p \
          data.smplh_path=smpl_models/smplh_amass "$@"
