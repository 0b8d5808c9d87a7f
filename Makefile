# Dev tasks (counterpart of the reference's invoke tasks, tasks.py:16-36).
# black/flake8/mypy are not baked into this image; lint targets degrade
# gracefully and run in any normal dev environment (pip install -e .[dev]).

PY ?= python

.PHONY: test test-fast bench bench-suite lint fmt examples

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PY) bench.py

bench-suite:
	$(PY) scripts/bench_suite.py

lint:
	@command -v black >/dev/null 2>&1 && black --check mbt_gym_tpu tests examples scripts || echo "black not installed; skipping"
	@command -v flake8 >/dev/null 2>&1 && flake8 --max-line-length 110 mbt_gym_tpu || echo "flake8 not installed; skipping"
	@command -v mypy >/dev/null 2>&1 && mypy mbt_gym_tpu || echo "mypy not installed; skipping"

fmt:
	@command -v black >/dev/null 2>&1 && black mbt_gym_tpu tests examples scripts || echo "black not installed"

examples:
	$(PY) examples/replicate_as.py --trajectories 500
	$(PY) examples/replicate_cjp.py --trajectories 500
