#!/bin/sh
# Round-5 chip work queue (phase 2 — after the views4 15k + trace + perf
# pass). One TPU process at a time (axon tunnel lock) — strictly
# sequential. NOTE: the 15k run's orbax checkpoints did not survive the
# between-session workspace reset (only committed artifacts did), so the
# OOD predict job drives the data1_2k control run's ckpt2000 instead.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

BASE="dataset=synthetic dataset.img_hw=[540,540] dataset.n_points=50000 \
 dataset.n_target_gaussians=50000 dataset.n_verts=4096 option=iter15k \
 opt.iterations=2000 test_interval=500 seed=0 log_every=10"

# 1. the three unfinished r04 ablations (VERDICT r5 #1, 2-view baseline rig)
python -m gsavatar.train $BASE \
  model.texture.sh_degree=0 model.texture.latent_dim=0 \
  exp_dir=RUNS/r05_abl_tex_plain > RUNS/r05_abl_tex_plain.log 2>&1

python -m gsavatar.train $BASE \
  pose_correction=none \
  exp_dir=RUNS/r05_abl_pose_none > RUNS/r05_abl_pose_none.log 2>&1

python -m gsavatar.train $BASE \
  pipeline.pose_noise=0 model.texture.view_noise=0 \
  exp_dir=RUNS/r05_abl_noise_off > RUNS/r05_abl_noise_off.log 2>&1

# 2. data>1 actually trains: B=2 batch semantics on one chip (VERDICT r5 #5)
python -m gsavatar.train $BASE \
  "dataset.train_views=['0','1','3','4']" \
  parallel.data=1 parallel.model=1 parallel.frames_per_step=2 \
  exp_dir=RUNS/r05_data2_2k > RUNS/r05_data2_2k.log 2>&1

# matched-iteration data=1 control for the data=2 comparison (its final
# checkpoint also feeds the OOD predict job below)
python -m gsavatar.train $BASE \
  "dataset.train_views=['0','1','3','4']" \
  exp_dir=RUNS/r05_data1_2k > RUNS/r05_data1_2k.log 2>&1

# 3. 2-subject batched training ON THE CHIP (VERDICT r5 #4): both
# subjects vmapped on the one device (no mesh), real TPU execution of the
# multi-subject program
python tools/run_multi_subject_chip.py > RUNS/r05_multisubject_chip.log 2>&1

# 4. OOD motion-driven animation of a trained checkpoint (VERDICT r5 #6)
python tools/run_predict_ood.py --ckpt RUNS/r05_data1_2k/ckpt2000 \
  --out RUNS/r05_predict_ood > RUNS/r05_predict_ood.log 2>&1

echo QUEUE_DONE
