"""Markdown evaluation report (reference: src/evaluate.py:12-28, 161-185).

Same template: date, runtime dump, config table, per-class score table. The
runtime section reports JAX device info instead of `nvidia-smi` (no NVIDIA
stack on TPU hosts; SURVEY.md §5).
"""

from __future__ import annotations

from datetime import date
from pathlib import Path

OUTPUT_FORMAT = """
# EVALUATION REPORT

## REPORTING DATE
{date}

## RUNTIME
```
{runtime}
```

## CONFIG
{config_table}

## SCORES
{score_table}
"""


def _float2str(val: float) -> str:
    return str(round(val, 3))


def runtime_info() -> str:
    import jax

    lines = [f"jax {jax.__version__}"]
    for d in jax.devices():
        lines.append(f"{d.id}: {d.device_kind} ({d.platform})")
    return "\n".join(lines)


def write_report(out_dir, args_dict: dict, aps, mean_ap: float, labelmap) -> Path:
    """aps: iterable of per-class AP (may contain nan); returns report path."""
    config_table = ["|item|value|", "|-|-|"]
    for k, v in args_dict.items():
        config_table.append(f"|{k}|{v}|")

    score_table = ["|label|average precision|", "|-|-|"]
    for class_id, ap in enumerate(aps):
        score_table.append(f"|{labelmap.id2name(class_id)}|{_float2str(float(ap))}|")
    score_table.append(f"|**mean**|**{_float2str(float(mean_ap))}**|")

    d = date.today().isoformat()
    report = OUTPUT_FORMAT.format(
        date=d,
        runtime=runtime_info(),
        config_table="\n".join(config_table),
        score_table="\n".join(score_table),
    )
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"report_{d}.md"
    with open(path, "w") as f:
        f.write(report)
    return path
