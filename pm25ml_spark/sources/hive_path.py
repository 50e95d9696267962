"""Hive-style key=value path utilities.

Re-expresses `hive_path.py:11-62` of the reference: archive artifacts live
at paths made of ``key=value`` segments (keys used: country, dataset,
month, year, type, stage). Spark understands these natively as partition
columns on read; this helper exists for driver-side archive layout logic
(planning, existence probes, as-of fallback).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class HivePath:
    """An ordered sequence of key=value path segments."""

    segments: tuple[tuple[str, str], ...] = field(default_factory=tuple)

    @classmethod
    def from_args(cls, **kwargs: str) -> "HivePath":
        return cls(tuple((k, str(v)) for k, v in kwargs.items()))

    @classmethod
    def from_path(cls, path: str) -> "HivePath":
        segs = []
        seen = set()
        for part in path.strip("/").split("/"):
            if "=" in part:
                k, v = part.split("=", 1)
                if k in seen:
                    # a duplicate key would silently collapse in the
                    # metadata dict and corrupt with_args' rebuild
                    raise ValueError(f"duplicate hive key {k!r} in {path!r}")
                seen.add(k)
                segs.append((k, v))
        return cls(tuple(segs))

    @property
    def metadata(self) -> dict[str, str]:
        return dict(self.segments)

    def require_key(self, key: str) -> str:
        md = self.metadata
        if key not in md:
            raise KeyError(f"hive path {self.path!r} lacks key {key!r}")
        return md[key]

    def with_args(self, **kwargs: str) -> "HivePath":
        updated = dict(self.segments)
        updated.update({k: str(v) for k, v in kwargs.items()})
        kept = [(k, updated.pop(k)) for k, _ in self.segments]
        return HivePath(tuple(kept + list(updated.items())))

    @property
    def path(self) -> str:
        return "/".join(f"{k}={v}" for k, v in self.segments)

    def __str__(self) -> str:  # pragma: no cover - repr convenience
        return self.path


@dataclass(frozen=True)
class DataArtifactRef:
    """A named pipeline stage checkpoint (combiners/data_artifact.py:10-44).

    Sub-artifacts (per-model stages) use the ``+`` separator:
    ``sampled+aod``, ``imputed+no2``.
    """

    stage: str

    def for_month(self, month: str) -> HivePath:
        return HivePath.from_args(stage=self.stage, month=month)

    def for_sub_artifact(self, name: str) -> "DataArtifactRef":
        return DataArtifactRef(stage=f"{self.stage}+{name}")
