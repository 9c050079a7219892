#!/bin/bash
# The published ACDC doubly-contrastive recipe (reference scripts/train_weather.sh:
# ADAM, lr 4e-4, wd 1e-4, 400 epochs, bs 8, epsilon 1e-1, train_semantic).
# Point --data_root at the directory containing acdc/ and provide an
# ImageNet resnet18 .pth via --pretrained for the trunk init.
python main.py \
  --dataset acdc --model resnet18 --train_semantic \
  --criterion supcon_pixelcontrast_focal \
  --epochs 400 --batch_size 8 --val_batch_size 8 \
  --lr 4e-4 --last_lr 1e-6 --weight_decay 1e-4 --epsilon 1e-1 \
  --optimizer_policy ADAM --lr_policy cos_annealing \
  --checkname doubly_contrastive_rn18 \
  "$@"
