#!/bin/bash
# Run the full benchmark suite — analog of scripts/profile_all.sh:5-33.
set -e
cd "$(dirname "$0")/.."

W=${W:-4096}
I=${I:-5}

echo "== summed table =="
python apps/summed_table.py -w $W -i $I --nocheck
echo "== box filters =="
for N in 1 3 6; do python apps/box_filter.py --iterations-of-box $N -w $W -i $I --nocheck; done
echo "== gaussian variants =="
for V in 3xy 3x_3y 1xy_2xy 1xy_2x_2y 1xy_1xy_1xy; do
    python apps/gaussian_filter.py --variant $V -w $W -i $I --nocheck
done
echo "== bspline =="
for V in bicubic biquintic biquintic_cascaded; do
    python apps/bspline_filter.py --variant $V -w $W -i $I --nocheck
done
echo "== usm =="
python apps/unsharp_mask.py -w $W -i $I
echo "== DoG =="
python apps/diff_gauss.py -w $W -i $I
echo "== audio =="
python apps/audio_filter.py --mode high_order --max-order 9 -i $I
