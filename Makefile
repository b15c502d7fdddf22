# Convenience targets (the reference's bazel build/test equivalents).

.PHONY: test native bench bench-all repl clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

bench-all:
	python benchmarks/run_all.py

# Interactive dev shell with the package pre-imported — the reference's
# `irepl` bazel target (src/common/custom_rules.bzl:48-57, src/BUILD:213).
repl:
	python -i -c "import jax, jax.numpy as jnp, numpy as np; \
	import quadrotorilqr_tpu as q; \
	from quadrotorilqr_tpu import api, costs, lie, models, solver; \
	print('quadrotorilqr_tpu REPL — jax', jax.__version__, \
	'devices', jax.devices())"

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
