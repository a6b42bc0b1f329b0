"""
Dump the optimized HLO of the production serving program so trace op
names (fusion.NNN) can be attributed to source operations.  The remote
compile service ignores --xla_dump_to, but AOT `compile().as_text()`
fetches the optimized module.

Shares the exact bench workload/model/lowering with bench.py and
scripts/trace_predict.py via nimrud_tpu.utils.workload, so the fusion
names line up by construction.

Usage: python scripts/dump_predict_hlo.py [backend] [out_path] [precision]
"""

import sys

from nimrud_tpu.utils.workload import (
    lower_predict, make_bench_cloud, make_bench_model)


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/predict_hlo.txt"
    precision = sys.argv[3] if len(sys.argv) > 3 else "highest"

    cloud, labels = make_bench_cloud()
    model = make_bench_model(cloud, backend=backend,
                             precision=precision, epochs=3)
    model.fit(cloud, labels, sample=20_000)
    staged = model.stage(cloud)
    assert staged is not None

    text = lower_predict(model, staged).compile().as_text()
    with open(out_path, "w") as handle:
        handle.write(text)
    print("wrote", out_path, len(text), "bytes")


if __name__ == "__main__":
    main()
