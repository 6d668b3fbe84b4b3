# RSPrompter-anchor on SSDD SAR ships (reference: configs/rsprompter/rsprompter_anchor-ssdd.py)
_base_ = ["./rsprompter_anchor-nwpu.py"]

num_classes = 1
prompt_shape = (60, 5)
model = dict(num_classes=num_classes, prompt_shape=prompt_shape)

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
