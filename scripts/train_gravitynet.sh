#!/bin/bash
python -m egoego_release_tpu.training.train_stage1 gravitynet \
    --motion_path data/amass_same_shape_egoego_processed/mocap_annotations.p "$@"
