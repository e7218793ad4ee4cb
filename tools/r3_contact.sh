#!/bin/bash
# Round-3 first-contact queue: bench at HEAD (fuse config recorded by the
# round-2 sweep), then the slot-body decomposition that picks this round's
# kernel lever.  ONE TPU process at a time; every step bounded; rc=124/137/
# 139 wipes the shared .jax_cache and waits the tunnel out (CLAUDE.md).
cd "$(dirname "$0")/.." || exit 1
log() { echo "== $* $(date -u +%H:%M:%S)"; }
guard_cache() {
  if [ "$1" = "124" ] || [ "$1" = "137" ] || [ "$1" = "139" ]; then
    log "rc=$1 — wiping .jax_cache defensively"
    rm -rf .jax_cache
    for i in $(seq 1 12); do
      timeout 120 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jnp.ones((8,128))*2)" >/dev/null 2>&1 && { log "tunnel recovered (try $i)"; return; }
      sleep 60
    done
    log "tunnel still wedged after ~24 min; continuing anyway"
  fi
}

log "1/3 bench.py (HEAD default config incl. recorded fuse winner)"
timeout 3000 python bench.py >/tmp/r3_bench.out 2>&1
rc=$?; log "bench rc=$rc"; grep -v WARNING /tmp/r3_bench.out | tail -2; guard_cache "$rc"

log "2/3 probe_slotbody (decomposition + finish/flag candidates)"
timeout 5400 python -u tools/probe_slotbody.py full noflag nofinish nobasis \
  defaultprec nounwrap empty nodma nokern nopole finB finC flagmm \
  >/tmp/r3_slotbody.out 2>&1
rc=$?; log "slotbody rc=$rc"; grep -v WARNING /tmp/r3_slotbody.out | tail -24; guard_cache "$rc"

log "3/3 tests_tpu (device parity at HEAD)"
timeout 2400 python -m pytest tests_tpu/ -x -q >/tmp/r3_tests.out 2>&1
rc=$?; log "tests_tpu rc=$rc"; tail -3 /tmp/r3_tests.out; guard_cache "$rc"

log "queue done"
touch /tmp/r3_contact_done
