# Developer entry points, mirroring the reference Makefile's test/benchmark
# surface (Makefile:238-360 there) on the TPU-native framework.

PY ?= python

.PHONY: all native sanitize test test-fast validate-eos benchmark benchmark-gate \
        bench-streaming soak clean

all: native

native:
	$(MAKE) -C csrc

# ASan+UBSan build of the native runtime + the native test suite under it
# (reference Makefile:151-159 hygiene).
sanitize:
	$(MAKE) -C csrc sanitize
	QTTS_NATIVE_LIB=$(CURDIR)/csrc/libqtts_runtime_asan.so \
	LD_PRELOAD=$$(g++ -print-file-name=libasan.so) \
	ASAN_OPTIONS=detect_leaks=0 \
	python -m pytest tests/test_native_runtime.py -q

test:
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/ -x -q \
	  --ignore=tests/test_cli_and_dryrun.py \
	  --ignore=tests/test_ref_parity.py \
	  --ignore=tests/test_continuous.py \
	  --ignore=tests/test_continuous_streaming.py \
	  --ignore=tests/test_continuous_inflight.py \
	  --ignore=tests/test_continuous_soak.py \
	  --ignore=tests/test_server_stream.py \
	  --ignore=tests/test_codec_v1.py \
	  --ignore=tests/test_whisper_vq.py \
	  --ignore=tests/test_mimi_encoder.py \
	  --ignore=tests/test_training.py \
	  --ignore=tests/test_demo_build.py \
	  --ignore=tests/test_acceptance_script.py \
	  --ignore=tests/test_parity.py \
	  --ignore=tests/test_sft_script_e2e.py \
	  --ignore=tests/test_multiprocess_dp.py \
	  --ignore=tests/test_train_resume.py \
	  --ignore=tests/test_soak_script.py

# Greedy token/EOS parity gate (fast jitted path vs cache-free oracle).
validate-eos:
	$(PY) scripts/validate_eos_parity.py --tiny

# One-command acceptance runbook (real weights: make acceptance MODEL_DIR=...).
acceptance:
	@if [ -n "$(MODEL_DIR)" ]; then \
	  $(PY) scripts/acceptance.py --model-dir $(MODEL_DIR); \
	else \
	  $(PY) scripts/acceptance.py --tiny; \
	fi

# Perf report on the current JAX platform (TPU by default).
benchmark:
	$(PY) scripts/benchmark.py

# Real-TPU continuous-serving soak (mixed load, cancels, 2 waves -> JSON).
soak:
	$(PY) scripts/soak_tpu.py

# Regression gate vs a stored baseline report.
BENCH_BASELINE ?= bench_baseline.json
benchmark-gate:
	@test -f $(BENCH_BASELINE) || ($(PY) scripts/benchmark.py --json $(BENCH_BASELINE) && echo "baseline written")
	$(PY) scripts/benchmark.py --gate $(BENCH_BASELINE) --gate-ratio 1.2

bench-streaming:
	$(PY) scripts/bench_streaming.py

# Regenerate every versioned perf artifact (real TPU): bench_b32.json,
# bench_streaming.json (bf16 + serving modes), bench_codec_v1.json,
# bench_vs_reference.json.
bench-all:
	$(PY) bench.py
	$(PY) scripts/bench_streaming.py
	$(PY) scripts/bench_streaming.py --serving
	$(PY) scripts/bench_codec_v1.py
	$(PY) scripts/benchmark_vs_reference.py --json bench_vs_reference.json || true

clean:
	$(MAKE) -C csrc clean
	rm -rf .pytest_cache qwen_tts_tpu/__pycache__
