#!/bin/bash
# Full SELF-GUIDED lifecycle on the TPU chip — the paper's headline path
# (ref: README.md:10-24 self-labeled IN64) executed end to end as ONE
# script with zero downloads:
#
#   stage 0 (host): synthesize a class-structured IN64-format pack
#                   (in64pickle.h5, the real on-disk contract)
#   stage 1 (chip): feat_extractor CLI  -> feat h5   (L2, SURVEY §2.7)
#   stage 2 (chip): cluster CLI (TPU k-means + exact 5-NN) -> cluster h5
#   stage 3 (host): FID reference dir from the pack
#   stage 4 (chip): main.py cluster-conditioned training (the h5 handoff)
#                   -> per-epoch val FID -> best ckpt -> test exploration
#   stage 5 (chip): generate.py from the run dir
#
# The SSL backbone runs weightless (seeded-random DINO ViT-B/16 — no
# pretrained weights exist in-image; the features are meaningless but the
# PIPELINE is the real one), so cluster quality is not the point: the
# point is that every stage consumes the previous stage's real artifact
# on real hardware.
set -e
cd /root/repo
DATA=/root/repo/outputs/selfguided_data
RUN=outputs/tpu_selfguided_r4
rm -rf $DATA $RUN
mkdir -p $DATA/imagenet64/size64

echo "=== stage 0: synthesize IN64-format pack (host) ==="
python - <<'EOF'
import numpy as np
from sgdm_tpu.data.synthetic import SyntheticImages
import h5py

def render(n, seed):
    ds = SyntheticImages(size=64, num_classes=10, length=n, seed=seed)
    rows = np.empty((n, 3 * 64 * 64), np.uint8)
    labels = np.empty((n,), np.int64)
    for i in range(n):
        it = ds[i]
        rows[i] = it["img4unsup"].transpose(2, 0, 1).reshape(-1)  # CHW flat
        labels[i] = int(np.argmax(it["label"]))
    return rows, labels

tr, trl = render(8192, seed=0)
va, val = render(512, seed=1)
with h5py.File("/root/repo/outputs/selfguided_data/imagenet64/size64/in64pickle.h5", "w") as f:
    f.create_dataset("data_train", data=tr)
    f.create_dataset("labels_train", data=trl)   # packs are 0-based
    f.create_dataset("data_val", data=va)
    f.create_dataset("labels_val", data=val)
print("pack written: 8192 train + 512 val, 64px, 10 classes")
EOF

echo "=== stage 1: feature extraction on-chip (DINO ViT-B/16, random init) ==="
python -m sgdm_tpu.selfsup.feat_extractor --feat dino_vitb16 --ds in64p \
  --bs 256 --image_size 64 --data_root $DATA/imagenet64 --out_root $DATA/feat
FEAT_H5=$(ls $DATA/feat/*.h5)
echo "feat h5: $FEAT_H5"

echo "=== stage 2: TPU k-means k=100 (niter=30, faiss semantics) + 5-NN ==="
python -m sgdm_tpu.selfsup.cluster --feat_h5 "$FEAT_H5" --k 100 --minp 20 \
  --nns 5 --out_root $DATA/cluster
CLUSTER_H5=$(ls $DATA/cluster/*.h5)
echo "cluster h5: $CLUSTER_H5"

echo "=== stage 3: FID reference dir (512 real train images) ==="
python - <<'EOF'
from sgdm_tpu.data.imagenet_pickle import ImageNetPickle
from sgdm_tpu.eval.harness import generate_fid_reference_dir
ds = ImageNetPickle(root="/root/repo/outputs/selfguided_data/imagenet64",
                    train=True, image_size=64, num_classes=10)
generate_fid_reference_dir(ds, "/root/repo/outputs/selfguided_data/fid_ref", num=512)
EOF

echo "=== stage 4: cluster-conditioned training on-chip ==="
python main.py data=in64_pickle data_root=$DATA name=tpu_selfguided_r4 \
  data.h5_file=$CLUSTER_H5 \
  sg.params.condition_method=cluster sg.params.cond_dim=100 \
  sg.params.cond_drop_prob=0.1 sg.params.cond_scale=2 \
  data.num_classes=10 data.params.batch_size=128 data.params.num_workers=8 \
  pl.trainer.max_epochs=2 pl.trainer.log_every_n_steps=16 \
  data.val_fid_num=64 data.test_fid_num=64 data.fid_every_n_epoch=1 \
  data.vis_every_iter=100 \
  data.fid_train_image_dir=$DATA/fid_ref

echo "=== stage 5: generate from the run dir ==="
python -m sgdm_tpu.generate --run $RUN --n 16 --sampler ddim --steps 50

echo "=== lifecycle complete ==="
ls $RUN
