#!/bin/bash
# Demo pipeline on the bundled fixture (mirror of the reference's
# scripts/test_egoego_pipeline.sh)
python -m egoego_release_tpu.eval.run_egoego \
    --data_root_folder test_data/ares \
    --stats_path test_data/ares/cano_min_max_mean_std_data_window_120.p \
    --diffusion_ckpt pretrained_models/stage2_diffusion_4.pt \
    --headnet_ckpt pretrained_models/stage1_headnet_ares_250.pt \
    --gravitynet_ckpt pretrained_models/stage1_gravitynet_2000.pt \
    --smplh_path smpl_models/smplh_amass "$@"
