#!/bin/bash
# Sequence driver (reference-compatible: /root/reference/run.sh).
# Trains laikago motion imitation on the five mocap sequences.
# No Xvfb needed: rendering uses the built-in software rasterizer.

### training
rm -rf logdir/mi-*
python main.py --urdf_template laikago --seqname mi-spin --logname 0
python main.py --urdf_template laikago --seqname mi-trot --logname 0
python main.py --urdf_template laikago --seqname mi-pace --logname 0
python main.py --urdf_template laikago --seqname mi-sidesteps --logname 0
python main.py --urdf_template laikago --seqname mi-turn --logname 0
