# Reproducibility targets (VERDICT r12 task 8) — one command per round
# artifact, matching the reference's Makefile deliverable shape
# (/root/reference/Makefile:45-54: fmt/lint/test targets driving the same
# checks CI runs). All data is the driver-generated deterministic testdata
# (TESTDATA.md, seed=42); the only nondeterminism in the artifacts is
# wall-clock, which BENCH lines carry calibration probes for.
#
#   make test                 - full pytest suite
#   make gate  ROUND=14       - strict driver-twin gate -> GATE_r<N>.json
#                               (every catalog entry hash-compared against
#                               its DuckDB oracle at the driver's sf0.01)
#   make bench ROUND=14       - exclusive-host clean bench ->
#                               BENCH_CLEAN_r<N>.json (+ stdout JSON line)
#   make verify ROUND=14      - gate + bench
#
# Run gate/bench EXCLUSIVELY (PERF.md host contract): concurrent Spark or
# pytest on the same host pollutes wall-clocks and the calibration probes.

ROUND ?= 14
PY ?= python
SF_DIR ?= /root/testdata/sf0.1

.PHONY: test gate bench verify

test:
	$(PY) -m pytest tests/ -q

gate:
	$(PY) tools/run_gate.py $(ROUND)

bench:
	SPARK_GRAFT_SF_DIR=$(SF_DIR) FSQL_BENCH_DETAIL_PATH=BENCH_CLEAN_r$(ROUND).json \
		$(PY) bench.py

verify: gate bench
