# Green-gate (VERDICT r4 item 4): no commit touching usdm_tpu/ lands without
# `make check` passing; the end-of-round snapshot additionally requires a
# successful `python bench.py` run on the chip (`make bench`).

.PHONY: check bench native test

check: native test

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	$(MAKE) -C native
