# Convenience targets mirroring the reference's makefile entry points
# (make test / make tests, makefile:155-164, 202-204).

PY ?= python

.PHONY: test tests goldens goldens-sharded goldens-tpu bench native clean

# quick smoke (the reference's `make test`)
test:
	$(PY) -m remhos_tpu -m periodic-square -p 0 -rs 2 -tf 0.1 -dt 0.01 \
	    -ho 3 -lo 5 -fct 2 -no-vis -d cpu

# full regression suite
tests:
	$(PY) -m pytest tests/ -q

# golden matrix vs the reference CI baseline
goldens:
	$(PY) tools/run_goldens.py

# the reference baseline is all `mpirun -np 2` (autotest/test.sh:14), and
# its in-process tests re-run at np=3 (CMakeLists.txt:79-81): mirror both
# as a recorded sharded gate — full matrix at 2 shards, a structured +
# unstructured + product + 3D sample at the odd count 3
goldens-sharded:
	$(PY) tools/run_goldens.py --n-shards 2
	$(PY) tools/run_goldens.py --n-shards 3 --only \
	    transport-cube-m1 remap-pacman-m3pa remap-cube3d-m5 \
	    transport-hexagon-m5 product-remap-fe-fct

# TPU production tier: a golden subset on the REAL chip in f32 with the
# fused Pallas kernels compiled (not interpret mode), compared against
# the reference baseline at f32-trajectory tolerances. Rows: both remap
# PA rows (these run the production fused geometry/convection kernels),
# one transport + one product-remap + one 3D row for method spread.
# The mega-kernel family (-ho 3 -lo 5 -fct 2) has no reference golden
# row; its real-chip physics is verified by bench.py (mass/bounds/
# cross-precision) and its trajectory by the interpret-mode f32 tier.
# The run is RECORDED: output tees into GOLDENS_TPU.dat (the analog of
# the reference's committed autotest/out_baseline.dat), so the real-chip
# golden claim is a file in the repo, not a commit message.
goldens-tpu:
	GOLDEN_PLATFORM=tpu $(PY) tools/run_goldens.py --f32 --pallas --only \
	    remap-pacman-m3pa remap-cube3d-m3pa transport-ballsjacks-m5 \
	    product-remap-fe-fct remap-cube3d-m5 2>&1 | tee GOLDENS_TPU.dat

# one-line JSON FOM benchmark (runs on the TPU)
bench:
	$(PY) bench.py

native:
	g++ -O2 -shared -fPIC -std=c++17 remhos_tpu/native/remhos_tables.cpp \
	    -o remhos_tpu/native/libremhos_tables.so

clean:
	rm -f remhos_tpu/native/libremhos_tables.so
	find . -name __pycache__ -type d -exec rm -rf {} +
