#!/bin/sh
# bf16 SpMV on a Matrix Market file (the reference's test/run_half.sh
# analog: ./spmv_half matrix.mtx).  Default input: test/example.mtx.
cd "$(dirname "$0")/.."
python bench.py --dtypes bf16 --iters 200 --mtx "${1:-test/example.mtx}"
