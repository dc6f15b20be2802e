"""Plan introspection: the reference has no optimizer (SURVEY.md §4 —
its 'plan' is a fixed C++ call graph); on Spark the plan IS the
artifact, so this package makes Catalyst's choices observable and
assertable (pushdown, broadcast, codegen spans)."""
