#!/bin/bash
# Download + extract PASCAL VOC 2007 (trainval + test) into $1 (default ~/data).
# Capability parity with /root/reference/data/scripts/VOC2007.sh.
set -e

start=$(date +%s)
root="${1:-$HOME/data}"
mkdir -p "$root"
cd "$root"

echo "Downloading VOC2007 trainval + test ..."
curl -LO http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtrainval_06-Nov-2007.tar
curl -LO http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtest_06-Nov-2007.tar

echo "Extracting ..."
tar xf VOCtrainval_06-Nov-2007.tar
tar xf VOCtest_06-Nov-2007.tar
rm -f VOCtrainval_06-Nov-2007.tar VOCtest_06-Nov-2007.tar

end=$(date +%s)
echo "VOC2007 ready under $root/VOCdevkit in $((end - start))s"
