#!/bin/bash
# Download + extract PASCAL VOC 2012 trainval into $1 (default ~/data).
# Capability parity with /root/reference/data/scripts/VOC2012.sh.
set -e

start=$(date +%s)
root="${1:-$HOME/data}"
mkdir -p "$root"
cd "$root"

echo "Downloading VOC2012 trainval ..."
curl -LO http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar

echo "Extracting ..."
tar xf VOCtrainval_11-May-2012.tar
rm -f VOCtrainval_11-May-2012.tar

end=$(date +%s)
echo "VOC2012 ready under $root/VOCdevkit in $((end - start))s"
