#!/bin/bash
# value-ordered banked measurement set under the current (annotated) link
cd /root/repo
OUT=tools/r5_bank
echo "BANK NOW start $(date +%H:%M:%S)" >> $OUT/probe_log.txt
timeout 1500 python bench.py avia                    > $OUT/avia.json         2>$OUT/avia.err
FAST_LIO_RESCORE=1 timeout 1500 python bench.py avia > $OUT/avia_rescore.json 2>$OUT/avia_rescore.err
timeout 1500 python bench.py avia                    > $OUT/avia2.json        2>$OUT/avia2.err
timeout 1800 python tools/bench_scaling.py --ablate  > $OUT/scaling_ablate.json 2>$OUT/scaling_ablate.err
timeout 1500 python tools/profile_stages.py avia     > $OUT/stages_avia.txt   2>$OUT/stages_avia.err
timeout 1500 python bench.py mid360                  > $OUT/mid360.json       2>$OUT/mid360.err
timeout 1500 python bench.py velodyne_outdoor        > $OUT/velodyne.json     2>$OUT/velodyne.err
timeout 2400 python bench.py ouster64                > $OUT/ouster64.json     2>$OUT/ouster64.err
timeout 1200 python tools/microbench_knn.py          > $OUT/microbench.txt    2>$OUT/microbench.err
echo "BANK NOW done $(date +%H:%M:%S)" >> $OUT/probe_log.txt
