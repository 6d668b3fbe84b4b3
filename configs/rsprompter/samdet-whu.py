# SAM-det on WHU (reference: configs/rsprompter/samdet-whu.py)
_base_ = ["./samdet-nwpu.py"]

model = dict(num_classes=1)

data_root = "/root/reference/data/WHU"
train_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="WHUInsSegDataset",
        data_root=data_root,
        ann_file="annotations/WHU_building_train.json",
        data_prefix=dict(img="imgs"),
    ),
)
val_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="WHUInsSegDataset",
        data_root=data_root,
        ann_file="annotations/WHU_building_test.json",
        data_prefix=dict(img="imgs"),
        test_mode=True,
    ),
)
test_dataloader = val_dataloader
