"""bbcrawl-compatible CLI front-end.

Usage (identical grammar to the reference, docs/cli_spec.txt):

    python -m bbcrawl_ray.cli [global*] -pager P [pagerflags*] \
        -crawler C [crawlerflags*] URL

Engine extensions (global flags, no reference counterpart):
    -transport synthetic|mapping|http   (default synthetic — no network here)
    -epochs N        frontier epochs (default 1 = reference semantics)
    -budget N        per-host pages per epoch
    -download true|false   run the download sink (default true)

Example:
    python -m bbcrawl_ray.cli -o /tmp/out -pager query -start 1 -end 5 \
        -crawler src -tags img http://forum.example/t
"""

from __future__ import annotations

import json
import sys


def main(argv: list[str]) -> int:
    from . import flags as F
    from ..functions.loglevels import configure as configure_logging
    from ..functions.loglevels import parse_loglevel
    from .partition import PipelineSpec, bind_crawler, bind_pager, parse_flagset, partition

    try:
        product = partition(argv)
        gvals = parse_flagset(
            product.global_flags,
            {
                "o": F.parse_fs_directory,
                "cookie-file": str,
                "loglevel": parse_loglevel,
                "transport": str,
                "epochs": F.parse_int,
                "budget": F.parse_int,
                "download": F.parse_boolean,
            },
        )
        spec = PipelineSpec(
            pager=bind_pager(product.pager, product.pager_flags, product.url),
            crawler=bind_crawler(product.crawler, product.crawler_flags),
            output_dir=gvals.get("o", ""),
            cookie_file=gvals.get("cookie-file", ""),
            loglevel=gvals.get("loglevel", "error"),
        )
    except ValueError as e:
        print(f"bbcrawl_ray: {e}", file=sys.stderr)
        return 2

    # real level filtering (logger.go:11-17): -loglevel error prints
    # error-and-worse; debug opens everything in the bbcrawl_ray tree.
    # Exported BEFORE ray.init so worker processes inherit the level
    # (stage code logs via loglevels.get_logger, which reads it).
    import os

    from ..functions.loglevels import ENV_VAR

    os.environ[ENV_VAR] = spec.loglevel
    configure_logging(spec.loglevel)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from ..functions.cookiefile import load_cookie_file
    from ..pipelines.crawl import CrawlConfig, run_crawl

    cookies = {}
    if spec.cookie_file:
        cookies = load_cookie_file(spec.cookie_file)

    out_root = spec.output_dir or "."
    cfg = CrawlConfig(
        crawler=spec.crawler,
        seeds=[spec.pager.seed_row("s0001")],
        output_root=out_root,
        transport=gvals.get("transport", "synthetic"),
        per_host_budget=gvals.get("budget"),
        max_epochs=gvals.get("epochs", 1),
        download_media=gvals.get("download", True),
        cookies=cookies,
    )
    res = run_crawl(cfg)
    docs = res.documents.count()
    man = res.manifest.to_pandas()
    summary = {
        "documents": docs,
        "manifest_rows": len(man),
        "manifest_status": man["status"].value_counts().to_dict() if len(man) else {},
        "checkpoints": res.checkpoint_root,
        "epochs": res.epochs_run,
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main(["bbcrawl_ray", *sys.argv[1:]]))
