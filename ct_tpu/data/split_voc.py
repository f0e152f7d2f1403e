"""Generate base-class-only VOC image lists for incremental pretraining.

Capability parity target: /root/reference/data/split_voc_dataset.py —
writes ``trainval_split{1,2,3}.txt`` listing only images that contain *no*
novel-class objects for the given split (novel classes = last 5 of the
split's ordering in ``ct_tpu.data.voc.VOC_CLASSES``).
"""

from __future__ import annotations

import argparse
import os
import xml.etree.ElementTree as ET

from ct_tpu.data.voc import VOC_CLASSES


def split_voc(rootpath: str, split: int, image_set: str = "trainval"):
    novel = set(VOC_CLASSES[split][-5:])
    listfile = os.path.join(rootpath, "ImageSets", "Main",
                            image_set + ".txt")
    outfile = os.path.join(rootpath, "ImageSets", "Main",
                           f"{image_set}_split{split}.txt")
    kept = []
    with open(listfile) as f:
        ids = [line.strip() for line in f if line.strip()]
    for img_id in ids:
        anno = os.path.join(rootpath, "Annotations", img_id + ".xml")
        names = {
            obj.find("name").text.lower().strip()
            for obj in ET.parse(anno).getroot().iter("object")
        }
        if not (names & novel):
            kept.append(img_id)
    with open(outfile, "w") as f:
        f.write("\n".join(kept) + "\n")
    print(f"split {split}: kept {len(kept)}/{len(ids)} images → {outfile}")
    return outfile


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("rootpath", help="e.g. data/VOCdevkit/VOC2007")
    parser.add_argument("--splits", type=int, nargs="+", default=[1, 2, 3])
    parser.add_argument("--image-set", default="trainval")
    args = parser.parse_args()
    for s in args.splits:
        split_voc(args.rootpath, s, args.image_set)


if __name__ == "__main__":
    main()
