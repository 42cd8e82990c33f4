#!/bin/bash
# unetca + layout guidance on the TPU chip — first hardware execution of
# the cross-attention model family (Attention_LR null-KV cross-attention,
# time/cond tokens, stego layout channel-concat).  Mirrors the reference's
# VOC/COCO self-segmented runs (ref: README.md:29-81, unetca_fast +
# stegoclusterlayout) on the zero-download synthetic seg fixture.
set -e
cd /root/repo
RUN=outputs/tpu_unetca_r5
rm -rf $RUN outputs/fid_ref_syn32seg

echo "=== FID reference dir + mask PNGs from the seg fixture (host) ==="
python - <<'EOF'
import numpy as np
from PIL import Image
from pathlib import Path
from sgdm_tpu.data.synthetic import SyntheticSegImages
from sgdm_tpu.eval.harness import generate_fid_reference_dir
ds = SyntheticSegImages(size=32, num_classes=10, length=256, seed=0, stego_k=11)
generate_fid_reference_dir(ds, "/root/repo/outputs/fid_ref_syn32seg", num=256)
md = Path("/root/repo/outputs/fid_ref_syn32seg_masks"); md.mkdir(exist_ok=True)
for i in range(8):  # id-pixel masks for layout-conditioned generation
    Image.fromarray(ds[i]["raw_mask"].astype(np.uint8)).save(md / f"m{i}.png")
EOF

echo "=== unetca_fast + stegoclusterlayout training on-chip ==="
python main.py data=synthetic32seg dynamic=unetca_fast name=tpu_unetca_r5 \
  sg.params.condition_method=stegoclusterlayout sg.params.cond_dim=11 \
  condition.stegoclusterlayout.layout_dim=11 \
  sg.params.cond_drop_prob=0.1 sg.params.cond_scale=2 \
  data.params.batch_size=64 data.params.train.params.length=4096 \
  pl.trainer.max_epochs=1 pl.trainer.log_every_n_steps=16 \
  data.val_fid_num=64 data.test_fid_num=64 data.fid_every_n_epoch=1 \
  data.vis_every_iter=100 \
  data.fid_train_image_dir=/root/repo/outputs/fid_ref_syn32seg

echo "=== layout-conditioned generation from the run dir ==="
python -m sgdm_tpu.generate --run $RUN --n 8 --sampler ddim --steps 50 \
  --mask-dir /root/repo/outputs/fid_ref_syn32seg_masks

echo "=== unetca smoke complete ==="
ls $RUN
