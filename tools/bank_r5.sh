#!/bin/bash
# r5 measurement banking: poll the tunnel; when the dispatch probe is
# healthy (< 0.45 ms/call), run the full measurement set back-to-back and
# save outputs.  PERF.md "tunnel variance" discipline.
cd /root/repo
OUT=tools/r5_bank
probe() {
timeout 150 python - <<'PY'
import time, jax, jax.numpy as jnp, numpy as np
g = jax.jit(lambda v: v * 1.000001 + 1e-9)
y = jnp.zeros((8,8), jnp.float32); y = g(y)
float(np.asarray(jax.device_get(y))[0,0])
best = 9e9
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(40): y = g(y)
    float(np.asarray(jax.device_get(y))[0,0])
    best = min(best, (time.perf_counter()-t0)/40*1e3)
print(f"{best:.3f}")
PY
}
TRIES=0
while true; do
  P=$(probe 2>/dev/null | tail -1)
  TRIES=$((TRIES+1))
  # healthy threshold 0.45; after ~1.5h of trying accept <= 0.9; later
  # bank under whatever link exists (annotated by the published probes)
  THR=0.45
  if [ $TRIES -gt 12 ]; then THR=0.9; fi
  if [ $TRIES -gt 20 ]; then THR=99; fi
  echo "$(date +%H:%M:%S) probe ${P} ms (try $TRIES thr $THR)" >> $OUT/probe_log.txt
  if python -c "exit(0 if float('${P:-999}') < $THR else 1)"; then
    echo "HEALTHY window at $(date +%H:%M:%S), banking..." >> $OUT/probe_log.txt
    timeout 1500 python bench.py avia                     > $OUT/avia.json        2>$OUT/avia.err
    FAST_LIO_RESCORE=1 timeout 1500 python bench.py avia  > $OUT/avia_rescore.json 2>$OUT/avia_rescore.err
    timeout 1500 python bench.py avia                     > $OUT/avia2.json       2>$OUT/avia2.err
    timeout 1200 python tools/microbench_knn.py           > $OUT/microbench.txt   2>$OUT/microbench.err
    timeout 1500 python bench.py mid360                   > $OUT/mid360.json      2>$OUT/mid360.err
    timeout 1500 python bench.py velodyne_outdoor         > $OUT/velodyne.json    2>$OUT/velodyne.err
    timeout 1500 python bench.py ouster64                 > $OUT/ouster64.json    2>$OUT/ouster64.err
    P2=$(probe 2>/dev/null | tail -1)
    echo "done at $(date +%H:%M:%S), post-probe ${P2} ms" >> $OUT/probe_log.txt
    break
  fi
  sleep 300
done
