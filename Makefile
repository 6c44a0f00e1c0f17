# Developer entry points for ccdm_tpu

.PHONY: test bench smoke native clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

# end-to-end smoke: tiny synthetic train + eval through the CLIs
smoke:
	python ccdm_train.py configs/params_smoke.yml --max-steps 6
	python ccdm_eval.py configs/params_smoke_eval.yml

native:
	$(MAKE) -C ccdm_tpu/native

clean:
	$(MAKE) -C ccdm_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
