#!/bin/bash
# Full pipeline eval on ares (mirror of scripts/eval_egoego_pipeline_on_ares.sh)
python -m egoego_release_tpu.eval.eval_egoego --test_on_ares \
    --data_root_folder data \
    --full_body_gt_path data/ares_processed_for_kinpoly/MoCapData/features/mocap_annotations.p \
    --bad_seq_path data/failed_seq_names/ares_bad_seq_names.pkl \
    --stats_path data/amass_same_shape_egoego_processed/cano_min_max_mean_std_data_window_120.p \
    --diffusion_ckpt pretrained_models/stage2_diffusion_4.pt \
    --headnet_ckpt pretrained_models/stage1_headnet_ares_*.pt \
    --gravitynet_ckpt pretrained_models/stage1_gravitynet_2000.pt \
    --smplh_path smpl_models/smplh_amass "$@"
