# Default runtime settings (reference: configs/rsprompter/_base_/rsprompter_anchor.py)
work_dir = "./work_dirs/rsprompter"
crop_size = (1024, 1024)
max_gt = 100
seed = 0
log_interval = 20
val_interval = 3
max_epochs = 300
base_lr = 0.0001
weight_decay = 0.05
warmup_iters = 50
