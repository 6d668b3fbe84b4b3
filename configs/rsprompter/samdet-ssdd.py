# SAM-det on SSDD (reference: configs/rsprompter/samdet-ssdd.py)
_base_ = ["./samdet-nwpu.py"]

model = dict(num_classes=1)

data_root = "/root/reference/data/SSDD"
train_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="SSDDInsSegDataset",
        data_root=data_root,
        ann_file="annotations/SSDD_instances_train.json",
        data_prefix=dict(img="imgs"),
    ),
)
val_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="SSDDInsSegDataset",
        data_root=data_root,
        ann_file="annotations/SSDD_instances_val.json",
        data_prefix=dict(img="imgs"),
        test_mode=True,
    ),
)
test_dataloader = val_dataloader
