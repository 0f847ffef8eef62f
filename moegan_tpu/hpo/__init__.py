from moegan_tpu.hpo.search import (
    SearchSpace,
    run_hpo,
    parse_metric_lines,
)

__all__ = ["SearchSpace", "run_hpo", "parse_metric_lines"]
