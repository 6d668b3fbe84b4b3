# Host-RSS evidence run: 2,000 training iters @512^2 bs4 with
# cache_train_batches=True (upload each collated batch once, reuse the
# device arrays every epoch — zero per-iter host->device traffic for this
# deterministic pipeline). Produces work_dirs/rss_cache_2k.log: the README
# "flat RSS" table row is the rss_mb column of this log.
_base_ = ["./rsprompter_anchor-nwpu-overfit16.py"]

cache_train_batches = True

max_epochs = 500  # 16 imgs / bs4 = 4 iters/epoch -> 2,000 iters
val_interval = 10_000  # no val: this probe measures the train loop only
ckpt_interval = 10_000
log_interval = 20
