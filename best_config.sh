#!/usr/bin/env bash
# Published-best hyperparameters per (model, dataset) — the executable
# reproduction protocol for the reference README results table
# (reference: best_config.sh; values per SURVEY.md §6 / BASELINE.md).
# Args: MODE MODEL DATASET GPU_ID SAVE_ID BATCH NEG DIM GAMMA ALPHA LR STEPS TESTB [flags]
#
# RotatE
bash run.sh train RotatE FB15k     0 0 1024 256 1000 24.0 1.0 0.0001  150000 16 -de
bash run.sh train RotatE FB15k-237 0 0 1024 256 1000  9.0 1.0 0.00005 100000 16 -de
bash run.sh train RotatE wn18      0 0  512 1024 500 12.0 0.5 0.0001   80000  8 -de
bash run.sh train RotatE wn18rr    0 0  512 1024 500  6.0 0.5 0.00005  80000  8 -de
bash run.sh train RotatE YAGO3-10  0 0 1024 400  500 24.0 1.0 0.0002  100000  4 -de
bash run.sh train RotatE countries_S1 0 0 512 64 1000 0.1 1.0 0.000002 40000 16 -de --countries
bash run.sh train RotatE countries_S2 0 0 512 64 1000 0.1 1.0 0.000002 40000 16 -de --countries
bash run.sh train RotatE countries_S3 0 0 512 64 1000 0.1 1.0 0.000002 40000 16 -de --countries
#
# TransE (mirror RotatE configs without -de)
bash run.sh train TransE FB15k     0 0 1024 256 1000 24.0 1.0 0.0001  150000 16
bash run.sh train TransE FB15k-237 0 0 1024 256 1000  9.0 1.0 0.00005 100000 16
bash run.sh train TransE wn18      0 0  512 1024 500 12.0 0.5 0.0001   80000  8
bash run.sh train TransE wn18rr    0 0  512 1024 500  6.0 0.5 0.00005  80000  8
#
# DistMult (large gamma = init-range only; L3 regularization)
bash run.sh train DistMult FB15k     0 0 1024 256 2000 500.0 1.0 0.001  150000 16 -r 0.000002
bash run.sh train DistMult FB15k-237 0 0 1024 256 2000 200.0 1.0 0.001  100000 16 -r 0.00001
bash run.sh train DistMult wn18      0 0  512 1024 1000 200.0 1.0 0.001  80000  8 -r 0.00001
bash run.sh train DistMult wn18rr    0 0  512 1024 1000 200.0 1.0 0.002  80000  8 -r 0.000005
#
# ComplEx (double entity + double relation; L3 regularization)
bash run.sh train ComplEx FB15k     0 0 1024 256 1000 500.0 1.0 0.001  150000 16 -de -dr -r 0.000002
bash run.sh train ComplEx FB15k-237 0 0 1024 256 1000 200.0 1.0 0.001  100000 16 -de -dr -r 0.00001
bash run.sh train ComplEx wn18      0 0  512 1024 500 200.0 1.0 0.001   80000  8 -de -dr -r 0.00001
bash run.sh train ComplEx wn18rr    0 0  512 1024 500 200.0 1.0 0.002   80000  8 -de -dr -r 0.000005
#
# pRotatE (mirror RotatE configs, single-width embeddings)
bash run.sh train pRotatE FB15k     0 0 1024 256 1000 24.0 1.0 0.0001  150000 16
bash run.sh train pRotatE FB15k-237 0 0 1024 256 1000  9.0 1.0 0.00005 100000 16
bash run.sh train pRotatE wn18      0 0  512 1024 500 12.0 0.5 0.0001   80000  8
bash run.sh train pRotatE wn18rr    0 0  512 1024 500  6.0 0.5 0.00005  80000  8
