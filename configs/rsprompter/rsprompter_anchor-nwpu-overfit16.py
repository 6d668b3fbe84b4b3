# Mask-stream learning proof: overfit 16 NWPU images @512^2 (VERDICT r2 #2).
#
# Everything trainable (encoder from scratch, SAM decoder unfrozen); val runs
# on the SAME 16 images — the question is pure capacity/gradient-flow: can the
# train-side mask chain (point_emb -> SAM decoder -> CE vs full-image targets,
# reference mmdet/rsprompter/models.py:1720-1744) memorize masks at all?
# Success bar: val segm mAP50 >= 0.8.
_base_ = ["./rsprompter_anchor-nwpu-scratch-512.py"]

train_dataloader = dict(batch_size=4, dataset=dict(indices=16))
# memorization probe: validate on the SAME 16 TRAIN images (the stock val
# split would measure generalization from 16 images, i.e. nothing)
val_dataloader = dict(
    batch_size=4,
    dataset=dict(
        ann_file="annotations/NWPU_instances_train.json",
        indices=16,
    ),
)
test_dataloader = val_dataloader

# no flip/jitter: memorization target, deterministic inputs help
train_aug = False

# the 16 images carry <= 20 instances each; tight GT padding cuts the
# per-iter packed-mask upload (and the tunnel's client-held-copy growth) 4x
max_gt = 24

base_lr = 2.0e-4
warmup_iters = 100
max_epochs = 1500  # 4 iters/epoch
val_interval = 100
ckpt_interval = 500
log_interval = 40
