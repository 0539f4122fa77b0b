"""Shared test fixtures: synthetic VOC dataset writer."""

import os
import xml.etree.ElementTree as ET

import numpy as np

from yolojax.data.cache import VOC_NAMES


def write_synthetic_voc(root, n_images=6, size=(96, 64), seed=0,
                        boxes_per_image=(1, 4)):
    """Write a minimal VOC devkit layout with random images + boxes."""
    import cv2

    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    ids = []
    rng = np.random.RandomState(seed)
    for i in range(n_images):
        img_id = f"{i:06d}"
        ids.append(img_id)
        w, h = size
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(root, "JPEGImages", img_id + ".jpg"), img)
        ann = ET.Element("annotation")
        sz = ET.SubElement(ann, "size")
        ET.SubElement(sz, "width").text = str(w)
        ET.SubElement(sz, "height").text = str(h)
        for _ in range(rng.randint(*boxes_per_image)):
            obj = ET.SubElement(ann, "object")
            cls = VOC_NAMES[rng.randint(len(VOC_NAMES))]
            ET.SubElement(obj, "name").text = cls
            ET.SubElement(obj, "difficult").text = "0"
            bb = ET.SubElement(obj, "bndbox")
            x0, y0 = rng.randint(0, w - 24), rng.randint(0, h - 24)
            ET.SubElement(bb, "xmin").text = str(x0)
            ET.SubElement(bb, "ymin").text = str(y0)
            ET.SubElement(bb, "xmax").text = str(x0 + rng.randint(12, 24))
            ET.SubElement(bb, "ymax").text = str(y0 + rng.randint(12, 24))
        ET.ElementTree(ann).write(
            os.path.join(root, "Annotations", img_id + ".xml"))
    for image_set in ("trainval", "test"):
        with open(os.path.join(root, "ImageSets", "Main",
                               image_set + ".txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
    return ids


def write_synthetic_coco(root, n_images=6, size=(96, 64), seed=0,
                         names=("red", "green", "blue")):
    """Write a minimal COCO layout: images/ + instances.json. Returns
    (ann_json_path, image_dir)."""
    import json

    import cv2

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    w, h = size
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        fname = f"{i:06d}.jpg"
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(img_dir, fname), img)
        images.append({"id": i + 1, "file_name": fname,
                       "width": w, "height": h})
        for _ in range(rng.randint(1, 3)):
            bw, bh = rng.randint(12, 32), rng.randint(12, 32)
            x0 = rng.randint(0, w - bw)
            y0 = rng.randint(0, h - bh)
            annotations.append({
                "id": ann_id, "image_id": i + 1,
                "category_id": 10 + rng.randint(len(names)),
                "bbox": [int(x0), int(y0), int(bw), int(bh)],
                "iscrowd": 0,
            })
            ann_id += 1
    ann = {
        "images": images,
        "categories": [{"id": 10 + k, "name": n}
                       for k, n in enumerate(names)],
        "annotations": annotations,
    }
    ann_path = os.path.join(root, "instances.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return ann_path, img_dir


def run_cli(module, argv, monkeypatch):
    """Drive a CLI module in-process: import cli.<name>, patch argv, main()."""
    import importlib
    import sys

    mod = importlib.import_module(module)
    monkeypatch.setattr(sys, "argv", [module] + argv)
    mod.main()
