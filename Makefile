# Build/packaging layer (the reference's build.sh/Android.mk analog).
#
#   make native   - build the C++ CAVLC packer + the libVideoCodec C ABI
#   make test     - run the full test suite (CPU, virtual 8-device mesh)
#   make bench    - run the single-chip throughput benchmark
#   make demo     - end-to-end encode/decode round-trip demo
#   make clean    - drop built artifacts

PY ?= python

.PHONY: native test bench demo clean

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
