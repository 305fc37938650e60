# Author eval recipe, TPU edition (reference val.sh:1): high-res 6-pass TTA.
# 1996 is not a multiple of the max stride; the CLI rounds up to 2016 with a
# warning (same check as reference utils/general.py:290-296).
python val.py --weights runs/train/ablation-ca-scconv-sppfcspc/best.npz \
    --imgsz 1996 --data VisDrone.yaml --augment --save-txt --save-conf \
    --task val --batch-size 8 --verbose --name v5l-xs
