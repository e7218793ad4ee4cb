#!/bin/bash
# First-TPU-contact queue (ROUND3_NOTES.md): run after an axon outage, ONE
# process at a time (a hung TPU program wedges the tunnel for everyone).
# Every step is timeout-bounded and logs to /tmp/contact_*.out; a failing
# step does not stop the later ones (each is independently useful).
#
# Usage: bash tools/tpu_contact.sh [--skip-health]
cd "$(dirname "$0")/.." || exit 1
log() { echo "== $* $(date -u +%H:%M:%S)"; }
# A step killed mid-cache-write (timeout rc=124) or segfaulting on a
# poisoned entry (rc=139) can corrupt the shared .jax_cache and take every
# later step down with it (see CLAUDE.md gotchas) — wipe it between steps
# when that happens.  Costs one recompile (~3 min), saves the queue.
guard_cache() { # $1 = rc of the step that just ran
  if [ "$1" = "124" ] || [ "$1" = "137" ] || [ "$1" = "139" ]; then
    log "rc=$1 — wiping .jax_cache defensively"
    rm -rf .jax_cache
    # a killed TPU program wedges the tunnel 5-20 min — wait for it to
    # answer a tiny op again before burning the next step's timeout
    for i in $(seq 1 12); do
      timeout 120 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jnp.ones((8,128))*2)" >/dev/null 2>&1 && { log "tunnel recovered (try $i)"; return; }
      sleep 60
    done
    log "tunnel still wedged after ~24 min; continuing anyway"
  fi
}

if [ "$1" != "--skip-health" ]; then
  log "health probe"
  timeout 150 python -c "import jax,numpy as np,jax.numpy as jnp; print('health:', float(np.asarray((jnp.ones((128,128))@jnp.ones((128,128))).sum())))" \
    || { log "TUNNEL DOWN — aborting"; exit 1; }
fi

log "1/7 bench.py (default config)"
timeout 3000 python bench.py >/tmp/contact_bench.out 2>&1
rc=$?; log "bench rc=$rc"; grep -v WARNING /tmp/contact_bench.out | tail -2; guard_cache "$rc"

log "2/7 tests_tpu (device parity)"
timeout 2400 python -m pytest tests_tpu/ -x -q >/tmp/contact_tests.out 2>&1
rc=$?; log "tests_tpu rc=$rc"; tail -3 /tmp/contact_tests.out; guard_cache "$rc"

log "3/6 probe_config (engine x A-sub x wy x pole-ladder sweep)"
timeout 5400 python -u tools/probe_config.py >/tmp/contact_config.out 2>&1
rc=$?; log "config rc=$rc"; grep -v WARNING /tmp/contact_config.out | tail -14; guard_cache "$rc"

log "4/6 probe_batch (vmap throughput, recorded winner config)"
timeout 3000 python -u tools/probe_batch.py >/tmp/contact_batch.out 2>&1
rc=$?; log "batch rc=$rc"; grep -v WARNING /tmp/contact_batch.out | tail -5; guard_cache "$rc"

log "5/6 probe_sharded (1-dev mesh overhead)"
timeout 3000 python -u tools/probe_sharded.py >/tmp/contact_sharded.out 2>&1
rc=$?; log "sharded rc=$rc"; grep -v WARNING /tmp/contact_sharded.out | tail -4; guard_cache "$rc"

log "6/6 re-bench at the recorded winner config"
timeout 3000 python bench.py >/tmp/contact_rebench.out 2>&1
rc=$?; log "re-bench rc=$rc"; grep -v WARNING /tmp/contact_rebench.out | tail -2; guard_cache "$rc"

log "queue done"
touch /tmp/tpu_contact_done
