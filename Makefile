# Build/packaging layer (the reference's build.sh/Android.mk analog).
#
#   make native   - build the C++ CAVLC packer + the libVideoCodec C ABI
#   make test     - run the full test suite (CPU, virtual 8-device mesh)
#   make bench    - run the single-chip throughput benchmark
#   make demo     - end-to-end encode/decode round-trip demo
#   make clean    - drop built artifacts

PY ?= python

.PHONY: native test smoke sanitize bench demo clean

# Smoke tier: the fast subset (unit + oracle tests; excludes the slow
# integration/conformance markers). Target budget: ~5 min on 2 CPUs.
smoke:
	$(PY) -m pytest tests/ -q -m "not slow" -p no:randomly

# ASan/UBSan pass over every exported native hot path (round-trip checks).
sanitize: csrc/cavlc_tables.inc
	g++ -std=c++17 -O1 -g -fsanitize=address,undefined \
	  csrc/cavlc_pack.cpp csrc/cabac_pack.cpp csrc/cavlc_parse.cpp \
	  csrc/cabac_parse.cpp csrc/sanitize_test.cpp -o csrc/build/sanitize_test
	./csrc/build/sanitize_test

csrc/cavlc_tables.inc:
	$(PY) csrc/gen_tables.py

native:
	$(PY) -c "from media_tpu import native; \
	  print('packer:', native._build_lib()); \
	  print('c-abi: ', native.build_capi())"

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

demo:
	$(PY) examples/roundtrip_demo.py 352 288 28 5

clean:
	rm -rf csrc/build csrc/cavlc_tables.inc
	find . -name __pycache__ -type d -exec rm -rf {} +
