# Pre-commit gate (VERDICT r3 item 1): NOTHING gets committed while any of
# these is red.  `make check` = full suite + real-chip bench + virtual
# 8-device multichip dryrun.  `make quick` is the fast inner-loop smoke
# (default-mode BDPT trace + import health) for mid-milestone commits.

PY ?= python

.PHONY: check quick test bench dryrun onchip

check: test onchip bench dryrun

test:
	$(PY) -m pytest tests/ -x -q

# Compiled-Pallas-vs-XLA correctness on the real chip (VERDICT r4 item
# 4); SKIPs cleanly when no TPU is attached.
onchip:
	timeout 1200 $(PY) tests/onchip_check.py

quick:
	JAX_PLATFORMS=cpu $(PY) -m pytest tests/test_smoke.py -x -q
	$(MAKE) dryrun

bench:
	timeout 900 $(PY) bench.py

dryrun:
	timeout 900 env XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  JAX_PLATFORMS=cpu $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
