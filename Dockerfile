# dmayolo_tpu — TPU-native DMA-YOLO framework
#
# Counterpart of the reference's NGC-pytorch Dockerfile (reference
# Dockerfile:1-30), targeting TPU VMs instead of CUDA. NOT built in the
# development environment (installs are forbidden there; everything below
# is already baked into that image) — this records the deployment recipe.
#
# Usage on a TPU VM (v5e/v6e):
#   docker build -t dmayolo_tpu .
#   docker run --privileged --net=host -v $(pwd)/runs:/app/runs dmayolo_tpu \
#       python train.py --cfg ablation-ca-scconv-sppfcspc.yaml \
#       --data VisDrone.yaml --hyp visdrone --img 1536 --adam --batch-size 4

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make libjpeg62-turbo-dev libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

# TPU jaxlib; torch (cpu wheel) only for checkpoint interop + parity tests
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax orbax-checkpoint chex einops numpy opencv-python-headless \
    pyyaml matplotlib pandas tensorboard \
    && pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

WORKDIR /app
COPY . /app

# native input path (JPEG decode + letterbox); falls back to cv2 if absent
RUN cd native && sh build.sh || true

ENV PYTHONUNBUFFERED=1
CMD ["python", "detect.py", "--help"]
