# Developer entry points for ccdm_tpu

.PHONY: test test-full bench bench-train bench-cityscapes smoke demo \
	demo-cityscapes native clean profile-train er-ab bench-flash-bwd

# fast tier: everything except the reference-certification loops and the
# 2-process multihost runs (~10-20 min depending on XLA compile-cache
# warmth; the excluded tier adds another ~40 min — see STATUS.md)
test:
	python -m pytest tests/ -x -q -m "not certification"

# the whole suite, certification tier included (~55 min on this host)
test-full:
	python -m pytest tests/ -x -q

bench:
	python bench.py

bench-train:
	BENCH_MODE=train python bench.py

# the hard config: 256x512 20-class Cityscapes with DINO ViT-B/8
# conditioning through the full sampler (vs torch reference at the same
# geometry — scripts/measure_reference_baseline.py BASE_CONFIG=cityscapes)
bench-cityscapes:
	BENCH_MODE=cityscapes python bench.py

# quality-regression gate: 5000-step synthetic-data demo with pinned
# GED/HM-IoU/Dice thresholds (TRAINING_DEMO.md protocol); DEMO_STEPS=800
# for a quicker run with looser gates. Fails on regression.
demo:
	python scripts/demo_gate.py

# quality gate for the OTHER eval family: 20-class learnable synthetic
# Cityscapes tree -> class-weighted training -> confidence-vote inference ->
# official re-scoring; fails if official mIoU regresses (CS_STEPS/CS_GATE_MIOU)
demo-cityscapes:
	python scripts/cityscapes_gate.py

# train-step breakdown: fwd/bwd/optimizer/EMA ms deltas (PERFNOTES
# "train-step roofline"); composes with BENCH_REMAT_ATTENTION/BENCH_NORM_FP32
profile-train:
	python scripts/profile_train_step.py

# encoder-reuse quality A/B over one checkpoint (ER_LEVELS / ER_CKPT env)
er-ab:
	python scripts/encoder_reuse_ab.py

# streaming vs dense flash-attention backward at the engaging geometry
bench-flash-bwd:
	python scripts/bench_flash_bwd.py

# end-to-end smoke: tiny synthetic train + eval through the CLIs
smoke:
	python ccdm_train.py configs/params_smoke.yml --max-steps 6
	python ccdm_eval.py configs/params_smoke_eval.yml

# same smoke forced onto the CPU backend (works when the TPU tunnel is
# down; --cpu flips jax.config before backend init — env vars are too late
# on images whose sitecustomize pre-imports jax)
smoke-cpu:
	python ccdm_train.py configs/params_smoke.yml --max-steps 6 --cpu
	python ccdm_eval.py configs/params_smoke_eval.yml --cpu

native:
	$(MAKE) -C ccdm_tpu/native

clean:
	$(MAKE) -C ccdm_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
