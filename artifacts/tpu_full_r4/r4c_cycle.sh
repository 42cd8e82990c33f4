#!/bin/bash
cd /root/repo
RUN=outputs/tpu_full_r4c
COMMON="data=synthetic32 name=tpu_full_r4c data.fid_train_image_dir=/root/repo/outputs/fid_ref_syn32 data.params.batch_size=128 data.params.train.params.length=8192 sg.params.condition_method=label sg.params.cond_dim=10 sg.params.cond_drop_prob=0.1 sg.params.cond_scale=2 pl.trainer.max_epochs=2 pl.trainer.log_every_n_steps=16 data.val_fid_num=64 data.test_fid_num=64 data.vis_every_iter=100"
echo "=== PHASE A: train, kill after first durable last ckpt ==="
python main.py $COMMON > /tmp/r4c_a.log 2>&1 &
P=$!
for i in $(seq 1 240); do
  [ -e $RUN/ckpts/last ] && break
  sleep 5
done
if [ ! -e $RUN/ckpts/last ]; then echo "TIMEOUT waiting for last ckpt"; kill -9 $P; exit 1; fi
echo "last ckpt appeared; waiting 20s into the next epoch then SIGKILL"
sleep 20
kill -9 $P
wait $P 2>/dev/null
echo "=== PHASE A killed (exit $?); ckpts now: ==="
ls -la $RUN/ckpts/
echo "=== PHASE B: resume from last ==="
python main.py $COMMON resume_from=/root/repo/$RUN/ckpts/last > /tmp/r4c_b.log 2>&1
echo "=== PHASE B exit: $? ==="
ls $RUN
