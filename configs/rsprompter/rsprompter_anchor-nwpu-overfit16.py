# Mask-stream learning proof: overfit 16 NWPU images @512^2 (VERDICT r2 #2).
#
# Everything trainable (encoder from scratch, SAM decoder unfrozen); val runs
# on the SAME 16 images — the question is pure capacity/gradient-flow: can the
# train-side mask chain (point_emb -> SAM decoder -> CE vs full-image targets,
# reference mmdet/rsprompter/models.py:1720-1744) memorize masks at all?
# Success bar: val segm mAP50 >= 0.8.
_base_ = ["./rsprompter_anchor-nwpu-scratch-512.py"]

train_dataloader = dict(batch_size=4, dataset=dict(indices=16))
val_dataloader = dict(batch_size=4, dataset=dict(indices=16))
test_dataloader = val_dataloader

# no flip/jitter: memorization target, deterministic inputs help
train_aug = False

base_lr = 2.0e-4
warmup_iters = 100
max_epochs = 1500  # 4 iters/epoch
val_interval = 100
ckpt_interval = 500
log_interval = 40
