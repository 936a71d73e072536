#!/bin/bash
# Poll the tunnel's D2H bandwidth; when it recovers, run the final
# round-5 TPU captures: QA cohorts (fixed code) + bench.
cd /root/repo
probe() {
  timeout 90 python -c "
import time, jax, jax.numpy as jnp, numpy as np
x = jnp.zeros(2_000_000, jnp.uint8); jax.block_until_ready(x)
t0=time.time(); z=np.asarray(x+1)
dt=time.time()-t0
print(f'{2/dt:.2f}')
exit(0 if dt < 2.0 else 1)
" 2>/dev/null
}
for i in $(seq 1 100); do
  bw=$(probe) && ok=1 || ok=0
  echo "$(date +%H:%M:%S) probe $i: D2H ${bw:-timeout} MB/s ok=$ok"
  if [ "$ok" = "1" ]; then
    echo "=== weather OK, running captures ==="
    KGT_QA_TPU=1 KGT_QA_ONLY=n25_d30_hiseq timeout 1800 \
      python scripts/research_qa.py research_qa_tpu3
    KGT_QA_TPU=1 KGT_QA_ONLY=n25_d30_novel timeout 1800 \
      python scripts/research_qa.py research_qa_tpu3
    timeout 900 python bench.py > bench_r5_capture.json 2> bench_r5_capture.log
    echo "=== captures done ==="
    exit 0
  fi
  sleep 180
done
echo "weather never recovered"
