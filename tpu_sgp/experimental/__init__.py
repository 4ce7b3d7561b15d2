"""Experimental modules — hardware-debugged case studies, NOT shipping paths.

Both Pallas implementations here run correctly on TPU and carry
interpret-mode tests, but were MEASURED UNPROFITABLE on the target backend
(docs/PERFORMANCE.md, NOTES.md round 2/3): in-kernel dynamic while-loop
iterations cost ~100us each, so the mega-kernel solver loses 3-5x to the
XLA general path, and the VMEM-resident projection serializes vmapped lanes
over the grid. They are kept as working case studies of the Pallas/Mosaic
porting pitfalls they document (narrow-vector ICEs, unrolled fori trip
counts, scoped-VMEM limits).

Import-time isolation: nothing in the shipping package imports this
namespace except the explicit opt-ins (``SGPConfig.projection_method=
'pallas'`` and direct imports in tests) — solver-state changes cannot
silently break production paths through these modules.
"""
