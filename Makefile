.PHONY: test bench native demos clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C trips_tpu/native

demos:
	python demos/demo_1d_deblurring.py --n 100 --parameter 5
	python demos/demo_2d_deblurring.py --n 32 --iters 15
	python demos/demo_tomography.py --n 32 --iters 15
	python demos/demo_dynamic_ct.py --nx 16 --nt 4 --iters 10
	python demos/demo_l_curve.py --n 32 --views 20 --iters 10

clean:
	$(MAKE) -C trips_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
