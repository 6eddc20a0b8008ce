# Developer entry points
.PHONY: test test-fast native bench synthetic clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_config.py tests/test_boxes.py tests/test_ops.py \
	  tests/test_text.py tests/test_data.py tests/test_native_decoder.py \
	  tests/test_pallas.py tests/test_pallas_window.py tests/test_lstm_text.py \
	  tests/test_boxlist.py tests/test_loss_numerics.py -q

native:
	$(MAKE) -C native/videodec

bench:
	python bench.py

synthetic:
	python -c "from vgqa_tpu.data.synthetic import make_synthetic_dataset; \
	  make_synthetic_dataset('data/synthetic')"

clean:
	$(MAKE) -C native/videodec clean
	find . -name __pycache__ -type d -exec rm -rf {} +
