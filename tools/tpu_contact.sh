#!/bin/bash
# First-TPU-contact queue (ROUND3_NOTES.md): run after an axon outage, ONE
# process at a time (a hung TPU program wedges the tunnel for everyone).
# Every step is timeout-bounded and logs to /tmp/contact_*.out; a failing
# step does not stop the later ones (each is independently useful).
#
# Usage: bash tools/tpu_contact.sh [--skip-health]
cd "$(dirname "$0")/.." || exit 1
log() { echo "== $* $(date -u +%H:%M:%S)"; }

if [ "$1" != "--skip-health" ]; then
  log "health probe"
  timeout 150 python -c "import jax,numpy as np,jax.numpy as jnp; print('health:', float(np.asarray((jnp.ones((128,128))@jnp.ones((128,128))).sum())))" \
    || { log "TUNNEL DOWN — aborting"; exit 1; }
fi

log "1/7 bench.py (default config)"
timeout 3000 python bench.py >/tmp/contact_bench.out 2>&1
log "bench rc=$?"; grep -v WARNING /tmp/contact_bench.out | tail -2

log "2/7 tests_tpu (device parity)"
timeout 2400 python -m pytest tests_tpu/ -x -q >/tmp/contact_tests.out 2>&1
log "tests_tpu rc=$?"; tail -3 /tmp/contact_tests.out

log "3/7 probe_engine (blockspec vs dma vs dma-all)"
timeout 3600 python -u tools/probe_engine.py >/tmp/contact_engine.out 2>&1
log "engine rc=$?"; grep -v WARNING /tmp/contact_engine.out | tail -8

log "4/7 probe_deadslot + probe_dma (slot-cost model)"
timeout 1200 python -u tools/probe_deadslot.py >/tmp/contact_dead.out 2>&1
log "deadslot rc=$?"; tail -4 /tmp/contact_dead.out
timeout 1200 python -u tools/probe_dma.py >/tmp/contact_dma.out 2>&1
log "dma rc=$?"; tail -4 /tmp/contact_dma.out

log "5/7 probe_sort (sort-binning A/B)"
timeout 3600 python -u tools/probe_sort.py >/tmp/contact_sort.out 2>&1
log "sort rc=$?"; grep -v WARNING /tmp/contact_sort.out | tail -6

log "6/7 probe_batch (vmap throughput, best engine per step 3)"
timeout 3000 python -u tools/probe_batch.py >/tmp/contact_batch.out 2>&1
log "batch rc=$?"; grep -v WARNING /tmp/contact_batch.out | tail -5

log "7/7 probe_sharded (1-dev mesh overhead)"
timeout 3000 python -u tools/probe_sharded.py >/tmp/contact_sharded.out 2>&1
log "sharded rc=$?"; grep -v WARNING /tmp/contact_sharded.out | tail -4

log "queue done"
touch /tmp/tpu_contact_done
