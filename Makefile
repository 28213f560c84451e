# Verification cadence (VERDICT r4 #7). Run `make verify` once per round
# before the snapshot and record the result in PROGRESS/commit message.

PY ?= python

.PHONY: test verify bench

# default suite: fast tests on the virtual 8-device CPU mesh
test:
	$(PY) -m pytest tests/ -x -q

# full verification: fast suite PLUS the slow-marked tests (production-width
# whole-model parity, train CLI smoke to orbax checkpoint, micro-overfit) —
# these are invisible to the default run and guard the production wiring.
verify:
	$(PY) -m pytest tests/ -q --runslow

# headline number on the real chip (requires the axon relay)
bench:
	$(PY) bench.py
