#!/bin/bash
# PatchCore training recipes (patchcore-inspection-main/sample_training.sh
# equivalents). Expected MVTec AD AUROCs with released torchvision weights:
# WR50 IM224 baseline: image 99.2 / pixel 98.1; IM320 99.3 / 97.8;
# Ensemble WR101+RNX101 IM320: 99.6 / 98.2 (reference README:188-191).
datapath=${1:-/data/mvtec_ad}

# IM224 WR50 baseline
python -m tpu_ac.cli.patchcore results/wr50_im224 \
    --data_path "$datapath" -b wideresnet50 -le layer2 -le layer3 \
    --pretrain_embed_dimension 1024 --target_embed_dimension 1024 \
    --anomaly_scorer_num_nn 1 --percentage 0.1 \
    --resize 256 --imagesize 224 --save_patchcore_model

# IM320 ensemble
python -m tpu_ac.cli.patchcore results/ensemble_im320 \
    --data_path "$datapath" \
    -b wideresnet101 -b resnext101 \
    -le layer2 -le layer3 \
    --pretrain_embed_dimension 1024 --target_embed_dimension 1024 \
    --anomaly_scorer_num_nn 1 --percentage 0.01 \
    --resize 366 --imagesize 320
