# Round-loop entry points. The Scala library itself needs only sbt;
# the oracle targets use the LOCAL python duckdb (driver-side tooling,
# never a library dependency).

SF_VERIFY ?= /root/testdata/sf0.01
SF_BENCH  ?= /root/testdata/sf0.1
VOUT      ?= /tmp/vout
CPUS      ?= 8

.PHONY: compile test verify bench prewarm soak

compile:
	sbt -batch compile

test:
	sbt -batch test

# correctness gate: prewarm-if-duckdb-changed (stamp-keyed no-op when
# warm), dump every query, compare against the DuckDB oracle
verify: prewarm
	SPARK_GRAFT_CPUS=$(CPUS) sbt -batch "runMain graft.Verify $(SF_VERIFY) $(VOUT)"
	python3 tools/compare.py $(SF_VERIFY) $(VOUT)

# fork-free bench launch (see tools/bench.sh for why not sbt runMain)
bench:
	SPARK_GRAFT_SF_DIR=$(SF_BENCH) SPARK_GRAFT_CPUS=$(CPUS) tools/bench.sh

# oracle-cache prewarm, keyed on the duckdb version stamp — warms the
# SAME dir verify compares (a default-dir warm would leave the real
# battery cold-starting inside compare.py after a duckdb bump)
prewarm:
	tools/prewarm_oracles.sh $(SF_VERIFY)

soak:
	SPARK_GRAFT_SF_DIR=$(SF_BENCH) SPARK_GRAFT_CPUS=$(CPUS) sbt -batch "runMain graft.Soak"
