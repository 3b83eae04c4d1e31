#!/bin/sh
# fp64 SpMV on a Matrix Market file (the reference's test/run_double.sh
# analog: ./spmv_double matrix.mtx).  Default input: test/example.mtx.
cd "$(dirname "$0")/.."
python bench.py --dtypes f64 --iters 200 --mtx "${1:-test/example.mtx}"
