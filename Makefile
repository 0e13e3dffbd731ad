# Developer entry points
.PHONY: test bench smoke native dryrun accuracy perf-session clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# end-to-end CLI smoke on synthetic data (runs anywhere, no assets needed)
smoke:
	python train.py --trainer CoOp --seed 1 \
	    --dataset-config-file configs/datasets/synthetic.yaml \
	    --config-file configs/trainers/tests/synthetic_tiny.yaml \
	    --output-dir /tmp/fsvlm_smoke DATASET.NUM_SHOTS 16

native:
	$(MAKE) -C native

dryrun:
	python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

# one-command weights-gated accuracy gate (docs/EVAL.md):
# goldens -> replay tests -> A/Bs -> reproduce driver
accuracy:
	bash tools/run_accuracy_gate.sh

# probe-gated TPU perf re-baseline (aborts in minutes if the tunnel is
# degraded): batch sweep -> winner-batch lane ceilings -> CoCoOp roofline
# -> final full-artifact bench (PERF.md, CLAUDE.md probe protocol)
perf-session:
	bash tools/run_perf_session.sh

clean:
	rm -rf output /tmp/fsvlm_smoke
	$(MAKE) -C native clean
