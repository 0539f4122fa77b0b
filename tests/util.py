"""Shared test fixtures: synthetic VOC dataset writer."""

import os
import xml.etree.ElementTree as ET

import numpy as np

from yolojax.data.cache import VOC_NAMES


def write_synthetic_voc(root, n_images=6, size=(96, 64), seed=0,
                        boxes_per_image=(1, 4), difficult_frac=0.0):
    """Write a minimal VOC devkit layout with random images + boxes.
    ``difficult_frac`` marks that fraction of objects difficult=1."""
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
            ET.SubElement(obj, "difficult").text = (
                "1" if rng.rand() < difficult_frac else "0")
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


def write_learnable_voc(root, n_images=32, size=96, seed=0,
                        classes=("aeroplane", "bicycle"), image_set="trainval"):
    """VOC layout with a LEARNABLE signal: gray images, one solid colored
    rectangle each, class <-> color. Small backbones trained from scratch
    through cli/train.py overfit this in a few hundred steps, which is what
    the real-backbone training-quality e2es need (VERDICT r2 #1). Appends
    to an existing layout when called twice with different image_set."""
    import cv2

    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    palette = [(230, 30, 30), (30, 30, 230), (30, 200, 30), (220, 200, 30)]
    rng = np.random.RandomState(seed)
    ids = []
    for i in range(n_images):
        img_id = f"{image_set}_{i:06d}"
        ids.append(img_id)
        dim = size
        img = np.full((dim, dim, 3), 128, np.uint8)
        cls_i = i % len(classes)
        bw = rng.randint(int(0.3 * dim), int(0.55 * dim))
        bh = rng.randint(int(0.3 * dim), int(0.55 * dim))
        x0 = rng.randint(2, dim - bw - 2)
        y0 = rng.randint(2, dim - bh - 2)
        r, g, b = palette[cls_i % len(palette)]
        img[y0:y0 + bh, x0:x0 + bw] = (b, g, r)  # cv2 writes BGR
        cv2.imwrite(os.path.join(root, "JPEGImages", img_id + ".jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        ann = ET.Element("annotation")
        sz = ET.SubElement(ann, "size")
        ET.SubElement(sz, "width").text = str(dim)
        ET.SubElement(sz, "height").text = str(dim)
        obj = ET.SubElement(ann, "object")
        ET.SubElement(obj, "name").text = classes[cls_i]
        ET.SubElement(obj, "difficult").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        ET.SubElement(bb, "xmin").text = str(x0)
        ET.SubElement(bb, "ymin").text = str(y0)
        ET.SubElement(bb, "xmax").text = str(x0 + bw)
        ET.SubElement(bb, "ymax").text = str(y0 + bh)
        ET.ElementTree(ann).write(
            os.path.join(root, "Annotations", img_id + ".xml"))
    with open(os.path.join(root, "ImageSets", "Main",
                           image_set + ".txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return ids


def write_learnable_coco(root, names_all, n_images=32, size=96, seed=0,
                         n_present=4):
    """COCO layout (images/ + instances.json) with a LEARNABLE signal AND
    a full-width category list: gray images, one solid colored rectangle
    each, class <-> color over ``n_present`` classes spread across
    ``names_all`` (pass the 80 COCO names for the BASELINE config-5 head
    shape: the cacher emits every category, so the model head carries all
    len(names_all) classes while the training signal stays overfittable).
    Category ids are sparse/1-based like real COCO. Returns
    (ann_json_path, image_dir)."""
    import json

    import cv2

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    palette = [(230, 30, 30), (30, 30, 230), (30, 200, 30), (220, 200, 30),
               (200, 30, 200), (30, 200, 200), (240, 130, 20), (120, 70, 20)]
    assert n_present <= len(palette), "distinct colors cap n_present"
    # spread the present classes across the category list so the head's
    # class axis is exercised at both ends, not just indices 0..n
    stride = max(len(names_all) // n_present, 1)
    present = [min(k * stride, len(names_all) - 1) for k in range(n_present)]
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        fname = f"{i:06d}.jpg"
        img = np.full((size, size, 3), 128, np.uint8)
        k = i % n_present
        bw = rng.randint(int(0.3 * size), int(0.55 * size))
        bh = rng.randint(int(0.3 * size), int(0.55 * size))
        x0 = rng.randint(2, size - bw - 2)
        y0 = rng.randint(2, size - bh - 2)
        r, g, b = palette[k]
        img[y0:y0 + bh, x0:x0 + bw] = (b, g, r)  # cv2 writes BGR
        cv2.imwrite(os.path.join(img_dir, fname), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        images.append({"id": i + 1, "file_name": fname,
                       "width": size, "height": size})
        annotations.append({
            "id": ann_id, "image_id": i + 1,
            "category_id": present[k] + 1,
            "bbox": [int(x0), int(y0), int(bw), int(bh)],
            "iscrowd": 0,
        })
        ann_id += 1
    ann = {
        "images": images,
        "categories": [{"id": c + 1, "name": n}
                       for c, n in enumerate(names_all)],
        "annotations": annotations,
    }
    ann_path = os.path.join(root, "instances.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return ann_path, img_dir
