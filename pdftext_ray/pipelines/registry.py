"""User-extension surface (SURVEY.md §2.11): a named stage registry.

The reference documents "check out pdftext.extraction._get_pages ... to dig
deeper" (README.md:107) plus a kwargs surface; the engine equivalent is a
registry of named Dataset→Dataset stages that users can register, replace,
and compose into pipelines:

    from pdftext_ray.pipelines.registry import REGISTRY, build_pipeline

    @REGISTRY.register("my_filter")
    def my_filter(ds, cfg):
        return ds.filter(expr="n_pages > 0")

    out = build_pipeline(["extract_spans", "my_filter", "flatten"], ds)

Every stage takes ``(ds, cfg)`` and returns a Dataset; cfg is an
``ExtractConfig`` (kernel knobs: quote_loosebox, superscript thresholds,
sort, hyphens, links, chars — the reference's kwargs surface,
pdftext/extraction.py:93-101).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import ray.data

from pdftext_ray.kernel.document import ExtractConfig

StageFn = Callable[[ray.data.Dataset, ExtractConfig], ray.data.Dataset]


class StageRegistry:
    def __init__(self):
        self._stages: Dict[str, StageFn] = {}

    def register(self, name: str) -> Callable[[StageFn], StageFn]:
        def deco(fn: StageFn) -> StageFn:
            self._stages[name] = fn
            return fn

        return deco

    def replace(self, name: str, fn: StageFn) -> None:
        if name not in self._stages:
            raise KeyError(f"unknown stage {name!r}")
        self._stages[name] = fn

    def get(self, name: str) -> StageFn:
        if name not in self._stages:
            raise KeyError(f"unknown stage {name!r}; known: {sorted(self._stages)}")
        return self._stages[name]

    def names(self) -> List[str]:
        return sorted(self._stages)


REGISTRY = StageRegistry()


def build_pipeline(
    stage_names: List[str], ds: ray.data.Dataset, cfg: Optional[ExtractConfig] = None
) -> ray.data.Dataset:
    cfg = cfg or ExtractConfig()
    for name in stage_names:
        ds = REGISTRY.get(name)(ds, cfg)
    return ds


# ---------------------------------------------------------------------------
# built-in stages
# ---------------------------------------------------------------------------

@REGISTRY.register("extract_spans")
def _extract_spans(ds, cfg):
    from pdftext_ray.pipelines import extract as P

    return P.extract_spans(ds, cfg)


@REGISTRY.register("extract_plain_text")
def _extract_plain(ds, cfg):
    from pdftext_ray.pipelines import extract as P

    return P.extract_plain_text(ds, cfg)


@REGISTRY.register("extract_dictionary")
def _extract_dict(ds, cfg):
    from pdftext_ray.pipelines import extract as P

    return P.extract_dictionary(ds, cfg)


@REGISTRY.register("extract_tables")
def _extract_tables(ds, cfg):
    from pdftext_ray.pipelines import extract as P

    return P.extract_tables(ds, cfg)


@REGISTRY.register("flatten")
def _flatten(ds, cfg):
    from pdftext_ray.pipelines import extract as P

    return P.flat_spans(ds)


@REGISTRY.register("drop_errors")
def _drop_errors(ds, cfg):
    return ds.filter(expr="error == ''")


@REGISTRY.register("token_count")
def _token_count(ds, cfg):
    from pdftext_ray.ops import textstats

    return textstats.token_counts(ds)


@REGISTRY.register("quality_score")
def _quality(ds, cfg):
    from pdftext_ray.ops import textstats

    return textstats.quality_scores(ds)


@REGISTRY.register("lang_id")
def _lang(ds, cfg):
    from pdftext_ray.ops import textstats

    return textstats.lang_id(ds)
