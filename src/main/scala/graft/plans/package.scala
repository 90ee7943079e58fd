package graft

/** Custom logical/physical plan components — DELIBERATELY EMPTY.
  *
  * The custom-operator preference order (SURVEY.md §2.12/§4, and the
  * Spark guidance this engine follows) is: (a) compose built-in
  * operators; (b) custom `Expression` / aggregate; (c) custom
  * `LogicalPlan` + `Rule` + `SparkStrategy` + `SparkPlan`;
  * (d) `mapPartitions`. Every operator this engine needed landed at
  * (a) or (b):
  *
  *  - as-of join → composed (tagged union + window carry-forward,
  *    [[graft.operators.AsOf]]) — a custom SparkPlan would
  *    re-implement exactly that sort-merge with none of Catalyst's
  *    free optimizations;
  *  - hot-path scalar work → codegen expressions
  *    ([[graft.functions.FloatDot]], [[graft.functions.PairPack]],
  *    [[graft.functions.Shingles]]);
  *  - bounded per-group top-K → a `TypedImperativeAggregate`
  *    ([[graft.functions.TopKByScore]]) whose partial phase prunes
  *    before the shuffle — the plan-level win a custom operator would
  *    have chased, obtained inside the aggregate framework;
  *  - session registration for external users →
  *    [[graft.functions.GraftExtensions]] (SparkSessionExtensions).
  *
  * If a future operator genuinely cannot be expressed this way (e.g.
  * a non-equi interval join both of whose sides are too large to
  * window on one key), this package is where the tier-(c) node,
  * rule, strategy and exec belong — the extension seam is already
  * wired through `GraftExtensions`.
  */
package object plans
