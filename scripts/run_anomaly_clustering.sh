#!/bin/bash
# Full anomaly-clustering sweep (Anomaly-Clustering README workflow):
# stage 1 computes (alpha, X) per category/mode, stage 2 writes the
# tau-sweep CSV with MVTec(object)/MVTec(texture) aggregate rows.
datapath=${1:-/data/mvtec_ad}

python -m tpu_ac.cli.main --path "$datapath" \
    --backbone_names dino_vitbase8 \
    --layers_to_extract_from blocks.10 blocks.11 \
    --pretrain_embed_dimension 2048 --target_embed_dimension 4096 \
    --supervised all --output_dir outputs

python -m tpu_ac.cli.evaluate --path "$datapath" --output_dir outputs
