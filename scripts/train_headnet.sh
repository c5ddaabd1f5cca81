#!/bin/bash
python -m egoego_release_tpu.training.train_stage1 headnet --dataset ares --data_root_folder data "$@"
