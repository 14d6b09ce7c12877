"""LIVECell dataset downloader.

Same sources and output layout as the reference script
(reference scripts/download_data.py:1-169): three COCO annotation JSONs
plus images.zip from the LIVECell S3 bucket, extracted and organized
into data/{train,val,test}/images by membership in the train/val
annotation files.

Usage: python -m livecell_tpu.data.download [--dest data]
"""

from __future__ import annotations

import argparse
import json
import shutil
import zipfile
from pathlib import Path

ANNOTATION_BASE_URL = (
    "https://livecell-dataset.s3.eu-central-1.amazonaws.com/"
    "LIVECell_dataset_2021/annotations/LIVECell")
IMAGES_URL = ("http://livecell-dataset.s3.eu-central-1.amazonaws.com/"
              "LIVECell_dataset_2021/images.zip")
ANNOTATIONS = {
    s: f"{ANNOTATION_BASE_URL}/livecell_coco_{s}.json"
    for s in ("train", "val", "test")}


def download_file(url: str, destination: Path, description: str = ""):
    import requests
    from tqdm import tqdm

    response = requests.get(url, stream=True)
    response.raise_for_status()
    total = int(response.headers.get("content-length", 0))
    with open(destination, "wb") as f, tqdm(
            desc=description or destination.name, total=total, unit="iB",
            unit_scale=True, unit_divisor=1024) as bar:
        for chunk in response.iter_content(chunk_size=1 << 20):
            bar.update(f.write(chunk))


def download_annotations(base: Path):
    ann_dir = base / "annotations"
    ann_dir.mkdir(parents=True, exist_ok=True)
    for split, url in ANNOTATIONS.items():
        dest = ann_dir / f"livecell_coco_{split}.json"
        if dest.exists():
            print(f"{dest.name} already exists, skipping")
            continue
        download_file(url, dest, f"{split} annotations")


def organize_images(base: Path, tmp: Path):
    """Split extracted images into train/val/test by annotation membership
    (reference download_data.py:80-135)."""
    train_val = tmp / "images" / "livecell_train_val_images"
    test = tmp / "images" / "livecell_test_images"
    if not train_val.exists() or not test.exists():
        train_val = tmp / "livecell_train_val_images"
        test = tmp / "livecell_test_images"

    for split in ("train", "val", "test"):
        (base / split / "images").mkdir(parents=True, exist_ok=True)

    if test.exists():
        dest = base / "test" / "images"
        for img in test.glob("*"):
            if img.is_file():
                shutil.move(str(img), str(dest / img.name))

    membership = {}
    for split in ("train", "val"):
        p = base / "annotations" / f"livecell_coco_{split}.json"
        if p.exists():
            with open(p) as f:
                names = {img["file_name"] for img in json.load(f)["images"]}
            membership[split] = names

    if train_val.exists():
        for img in train_val.glob("*"):
            if not img.is_file():
                continue
            for split, names in membership.items():
                if img.name in names:
                    shutil.move(str(img),
                                str(base / split / "images" / img.name))
                    break


def download_and_extract_images(base: Path):
    zip_path = base / "images.zip"
    if not zip_path.exists():
        download_file(IMAGES_URL, zip_path, "images.zip")
    tmp = base / "temp_images"
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(tmp)
    organize_images(base, tmp)
    shutil.rmtree(tmp, ignore_errors=True)
    zip_path.unlink(missing_ok=True)


def main(argv=None):
    parser = argparse.ArgumentParser(description="LIVECell downloader")
    parser.add_argument("--dest", type=str, default="data")
    parser.add_argument("--annotations_only", action="store_true")
    args = parser.parse_args(argv)

    base = Path(args.dest)
    base.mkdir(parents=True, exist_ok=True)
    download_annotations(base)
    if not args.annotations_only:
        download_and_extract_images(base)
    print(f"Dataset saved to {base.resolve()}")


if __name__ == "__main__":
    main()
