#!/bin/bash
# Experiment launcher mirroring the reference driver (code/train.sh):
# ACDC semi-supervised splits {3,7}, BraTS {25,50}, AMOS {15,30}.
set -e
cd "$(dirname "$0")"

# --- ACDC, ICL 2D UNet ---
python train_inherent_consistent_unet_2D.py --root_path ../ACDC \
  --exp ACDC/Inherent_Consistent_Learning --model icl_unet --labeled_num 7 \
  --num_tries "${NUM_TRIES:-1}"
# python train_inherent_consistent_unet_2D.py --labeled_num 3 ...

# --- ACDC, ICL SwinUNet ---
# python train_inherent_consistent_swinunet_2D.py --root_path ../ACDC \
#   --model icl_swinunet --labeled_num 7 --patch_size 224 224

# --- BraTS2019, ICL 3D UNet ---
# python train_inherent_consistent_unet_3D_BraTS.py --root_path ../data/BraTS2019 \
#   --model unet_3D_icl --labeled_num 25

# --- BraTS2019, ICL SwinUNETR ---
# python train_inherent_consistent_swinunetr_3D_BraTS.py --root_path ../data/BraTS2019 \
#   --model swinunetr_icl --labeled_num 25

# --- AMOS22, ICL 3D UNet ---
# python train_inherent_consistent_unet_3D_AMOS22.py \
#   --split_path ../data/AMOS22/dataset_semi_ct.json --labeled_num 30
