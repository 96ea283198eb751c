#!/bin/bash
# Offline evaluation launcher mirroring the reference driver (code/test.sh).
set -e
cd "$(dirname "$0")"

python test_2D_ACDC.py --root_path ../ACDC \
  --exp ACDC/Inherent_Consistent_Learning --model icl_unet --labeled_num 7

# python test_3D_BraTS.py --root_path ../data/BraTS2019 --model unet_3D_icl --labeled_num 25
# python test_3D_AMOS.py --split_path ../data/AMOS22/dataset_semi_ct.json --model unet_3D_icl
