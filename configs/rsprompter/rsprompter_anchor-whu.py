# RSPrompter-anchor on WHU buildings (reference: configs/rsprompter/rsprompter_anchor-whu.py)
_base_ = ["./rsprompter_anchor-nwpu.py"]

num_classes = 1
prompt_shape = (100, 5)
model = dict(num_classes=num_classes, prompt_shape=prompt_shape)

data_root = "/root/reference/data/WHU"
train_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="WHUInsSegDataset",
        data_root=data_root,
        ann_file="annotations/WHU_building_train.json",
        data_prefix=dict(img="imgs/train/image"),
    ),
)
val_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="WHUInsSegDataset",
        data_root=data_root,
        ann_file="annotations/WHU_building_test.json",
        data_prefix=dict(img="imgs/test/image"),
        test_mode=True,
    ),
)
test_dataloader = val_dataloader
