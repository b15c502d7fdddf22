# Convenience targets (the reference's bazel build/test equivalents).

.PHONY: test native bench bench-all clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

bench-all:
	python benchmarks/run_all.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
