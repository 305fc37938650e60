# Author run recipes, TPU edition (reference train.sh:1-3).
# One v5e chip; --fastload (C++ JPEG decode) and --device-aug (fused on-device
# HSV/flip on uint8 input) replace the reference's CUDA dataloader tuning.

# Flagship DMA-YOLO on VisDrone @1536px (reference train.sh:1).
python train.py --imgsz 1536 --adam --batch-size 4 --epochs 200 \
    --data VisDrone.yaml --hyp hyp.VisDrone.yaml \
    --cfg ablation-ca-scconv-sppfcspc.yaml --name ablation-ca-scconv-sppfcspc \
    --fastload --device-aug --remat

# C3CASPD2 on UAVDT @1024px from yolov5l init (reference train.sh:2).
python train.py --imgsz 1024 --adam --batch-size 8 --epochs 150 \
    --data UAVDT.yaml --hyp hyp.scratch.yaml --weights weights/yolov5l.npz \
    --cfg C3CASPD2.yaml --name C3CASPD2-UAVDT --fastload --device-aug

# CASPD_ODRTA (TAL head) on VisDrone @1536px (reference train.sh:3).
python train.py --imgsz 1536 --adam --batch-size 4 --epochs 200 \
    --data VisDrone.yaml --hyp hyp.VisDrone.yaml --weights weights/yolov5l.npz \
    --cfg CASPD_ODRTA.yaml --name CASPD_ODRTA --assignment tal \
    --fastload --device-aug --remat
