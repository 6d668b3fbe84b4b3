"""COCO-format instance-segmentation datasets (no pycocotools dependency).

Behavior parity: reference ``mmdet/datasets/coco.py:14`` (``CocoDataset``) and
the three RSPrompter dataset classes (``mmdet/rsprompter/datasets.py:5,17,25``)
— WHU buildings, NWPU VHR-10, SSDD SAR ships, which only override METAINFO.
Annotations are plain COCO json (shipped in the reference's ``data/`` tree);
polygons are rasterized with cv2 on the host.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from rsprompter_tpu.core.registry import DATASETS


def poly_to_mask(polygons: Sequence[Sequence[float]], h: int, w: int) -> np.ndarray:
    """COCO polygon list -> uint8 binary mask (cv2 rasterization)."""
    import cv2

    mask = np.zeros((h, w), np.uint8)
    pts = [
        np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
        for p in polygons
        if len(p) >= 6
    ]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def rle_dict_to_mask(rle: Dict, h: int, w: int) -> np.ndarray:
    """Uncompressed COCO RLE dict -> binary mask."""
    from rsprompter_tpu.evaluation.rle import RLE, decode_mask

    return decode_mask(RLE(h, w, np.asarray(rle["counts"], np.uint32)))


@DATASETS.register_module()
class CocoDataset:
    METAINFO: Dict[str, Any] = {"classes": (), "palette": ()}

    def __init__(
        self,
        ann_file: str,
        data_root: str = "",
        data_prefix: Optional[Dict[str, str]] = None,
        pipeline: Sequence = (),
        test_mode: bool = False,
        filter_empty_gt: bool = False,
        indices: Optional[Sequence[int]] = None,
        metainfo: Optional[Dict] = None,
    ):
        self.data_root = data_root
        self.img_prefix = (data_prefix or {}).get("img", "")
        self.test_mode = test_mode
        self.metainfo = dict(self.METAINFO)
        if metainfo:
            self.metainfo.update(metainfo)
        self.pipeline = list(pipeline)

        ann_path = ann_file
        if data_root and not os.path.isabs(ann_path):
            ann_path = os.path.join(data_root, ann_file)
        with open(ann_path) as f:
            coco = json.load(f)

        cats = sorted(coco["categories"], key=lambda c: c["id"])
        classes = self.metainfo.get("classes") or tuple(c["name"] for c in cats)
        self.metainfo["classes"] = tuple(classes)
        name_to_label = {n: i for i, n in enumerate(classes)}
        self.cat_id_to_label = {
            c["id"]: name_to_label[c["name"]]
            for c in cats
            if c["name"] in name_to_label
        }
        self.label_to_cat_id = {v: k for k, v in self.cat_id_to_label.items()}

        anns_by_img: Dict[int, List[Dict]] = {}
        for a in coco["annotations"]:
            anns_by_img.setdefault(a["image_id"], []).append(a)

        self.data_list: List[Dict] = []
        for img in coco["images"]:
            anns = anns_by_img.get(img["id"], [])
            if filter_empty_gt and not test_mode and not anns:
                continue
            self.data_list.append(
                dict(
                    img_id=img["id"],
                    img_path=os.path.join(
                        self.data_root, self.img_prefix, img["file_name"]
                    ),
                    height=img["height"],
                    width=img["width"],
                    anns=anns,
                )
            )
        if indices is not None:
            if isinstance(indices, int):
                self.data_list = self.data_list[:indices]
            else:
                self.data_list = [self.data_list[i] for i in indices]

    def __len__(self) -> int:
        return len(self.data_list)

    def load_raw(self, idx: int) -> Dict[str, Any]:
        """One sample as the transform-pipeline input dict."""
        import cv2

        info = self.data_list[idx]
        img = cv2.imread(info["img_path"], cv2.IMREAD_COLOR)  # BGR, HWC
        if img is None:
            raise FileNotFoundError(info["img_path"])
        img = img.astype(np.float32)
        h, w = img.shape[:2]

        bboxes, labels, masks, ignores, areas = [], [], [], [], []
        for a in info["anns"]:
            if a["category_id"] not in self.cat_id_to_label:
                continue
            x, y, bw, bh = a["bbox"]
            bboxes.append([x, y, x + bw, y + bh])
            labels.append(self.cat_id_to_label[a["category_id"]])
            ignores.append(bool(a.get("iscrowd", 0)))
            # COCO 'area' is the segmentation area, and is what pycocotools'
            # area-range ignore rule reads (cocoeval _prepare/evaluateImg);
            # bbox area is only a fallback for area-less annotations
            areas.append(float(a.get("area", bw * bh)))
            seg = a.get("segmentation")
            if isinstance(seg, list):
                masks.append(poly_to_mask(seg, h, w))
            elif isinstance(seg, dict):
                masks.append(rle_dict_to_mask(seg, h, w))
            else:
                masks.append(np.zeros((h, w), np.uint8))
        n = len(bboxes)
        return dict(
            img=img,
            img_id=info["img_id"],
            img_path=info["img_path"],
            ori_shape=(h, w),
            img_shape=(h, w),
            scale_factor=(1.0, 1.0),
            gt_bboxes=np.asarray(bboxes, np.float32).reshape(n, 4),
            gt_labels=np.asarray(labels, np.int64),
            gt_ignore_flags=np.asarray(ignores, bool),
            gt_areas=np.asarray(areas, np.float64),
            gt_masks=(
                np.stack(masks) if masks else np.zeros((0, h, w), np.uint8)
            ),
        )

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        sample = self.load_raw(idx)
        for t in self.pipeline:
            sample = t(sample)
            if sample is None:
                # filtered out (train-time): resample another index
                return self[np.random.randint(len(self))]
        return sample


@DATASETS.register_module()
class NWPUInsSegDataset(CocoDataset):
    METAINFO = {
        "classes": (
            "airplane", "ship", "storage_tank", "baseball_diamond",
            "tennis_court", "basketball_court", "ground_track_field",
            "harbor", "bridge", "vehicle",
        ),
        "palette": [
            (220, 20, 60), (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100),
            (0, 80, 100), (0, 0, 230), (119, 11, 32), (0, 255, 0), (0, 0, 255),
        ],
    }


@DATASETS.register_module()
class WHUInsSegDataset(CocoDataset):
    METAINFO = {"classes": ("building",), "palette": [(0, 255, 0)]}


@DATASETS.register_module()
class SSDDInsSegDataset(CocoDataset):
    METAINFO = {"classes": ("ship",), "palette": [(0, 0, 255)]}
