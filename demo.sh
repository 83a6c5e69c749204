#!/usr/bin/env bash
# Launch commands (parity with the reference's per-task demo.sh files).
# Single-controller JAX: no torch.distributed.launch equivalent is needed —
# one process drives all local devices; multi-host runs set the usual JAX
# coordinator env and IRSDE_MULTIHOST=1.

# train IR-SDE deraining
python tools/train.py -opt=configs/deraining/train/ir-sde.yml

# train Refusion (NAFNet backbone)
python tools/train.py -opt=configs/deraining/train/refusion.yml

# evaluate
python tools/test.py -opt=configs/deraining/test/ir-sde.yml

# latent stack: compressor pretrain, then latent diffusion
python tools/train.py -opt=configs/unet-latent/train/train_haze.yml
python tools/train.py -opt=configs/latent-dehazing/train/nasde.yml

# single-image restoration (add --tile 512 for large inputs)
python tools/restore.py -opt=configs/deraining/test/ir-sde.yml -i in.png -o out.png

# image morphing demo (forward mean-reverting SDE)
python tools/interpolation.py -s source.png -t target.png --save states/

# multi-host data parallel (per host):
# IRSDE_MULTIHOST=1 JAX_COORDINATOR_ADDRESS=... python tools/train.py -opt=...
