#!/bin/bash
# VisDA17 staging checker.  Parity: reference
# Dassl.pytorch/datasets/da/visda17.sh, which wget+untars train.tar /
# validation.tar / test.tar from http://csr.bu.edu/ftp/visda17/clf/ plus the
# taskcv-2017 test image_list.txt.  This environment has no network egress,
# so this script verifies the expected on-disk layout instead and prints
# staging instructions when something is missing.
# usage: bash scripts/datasets/visda17.sh [data_root]
ROOT=${1:-${DATA:-~/data}}/visda17
ok=1
for split in train validation test; do
    if [ -f "${ROOT}/${split}/image_list.txt" ]; then
        n=$(wc -l < "${ROOT}/${split}/image_list.txt")
        echo "found ${ROOT}/${split} (${n} listed images)"
    else
        echo "MISSING ${ROOT}/${split}/image_list.txt"
        ok=0
    fi
done
if [ ${ok} -eq 1 ]; then
    echo "visda17 layout OK"
else
    echo "Stage the official archives (no egress here):"
    echo "  http://csr.bu.edu/ftp/visda17/clf/{train,validation,test}.tar"
    echo "  -> extract each into ${ROOT}/"
    echo "  plus taskcv-2017-public classification/data/image_list.txt"
    echo "  -> ${ROOT}/test/image_list.txt"
    exit 1
fi
