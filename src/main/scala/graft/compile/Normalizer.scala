package graft.compile

import graft.ast._

/** DSL-level AST normalizer — the pre-Catalyst pass SURVEY §4 calls for
  * (the only rewrites worth doing above Spark): adjacent-filter fusion and
  * nested-merge flattening. Everything else (pushdown, pruning, reorder,
  * folding) is Catalyst's job and intentionally not duplicated here.
  */
object Normalizer {

  def normalize(node: KNode): KNode = {
    val n = mapChildren(node, normalize)
    n match {
      // fuse Filter(Filter(x)) into one conjunction (preserving negation)
      case FilterOp(FilterOp(up, p1, n1), p2, n2) =>
        val e1 = if (n1) !p1 else p1
        val e2 = if (n2) !p2 else p2
        normalize(FilterOp(up, e1 && e2, negate = false))
      // flatten Merge(Merge(a,b),c) → Merge(a,b,c)  (one union node)
      case MergeOp(ups) if ups.exists(_.isInstanceOf[MergeOp]) =>
        MergeOp(ups.flatMap {
          case MergeOp(inner) => inner
          case other => Seq(other)
        })
      case other => other
    }
  }

  /** Structural recursion over each node's upstream children. */
  private def mapChildren(node: KNode, f: KNode => KNode): KNode = node match {
    case n: StreamSource => n
    case n: TableSource => n
    case n: GlobalTableSource => n
    case n: FilterOp => n.copy(up = f(n.up))
    case n: MapValuesOp => n.copy(up = f(n.up))
    case n: MapOp => n.copy(up = f(n.up))
    case n: SelectKeyOp => n.copy(up = f(n.up))
    case n: FlatMapValuesOp => n.copy(up = f(n.up))
    case n: FlatMapOp => n.copy(up = f(n.up))
    case n: BranchOp => n.copy(up = f(n.up))
    case n: MergeOp => n.copy(ups = n.ups.map(f))
    case n: PeekOp => n.copy(up = f(n.up))
    case n: ToStreamOp => n.copy(up = f(n.up))
    case n: RepartitionOp => n.copy(up = f(n.up))
    case n: SelectOp => n.copy(up = f(n.up))
    case n: SortOp => n.copy(up = f(n.up))
    case n: GroupByOp => n.copy(up = f(n.up))
    case n: GroupByKeyOp => n.copy(up = f(n.up))
    case n: CountOp => n.copy(grouped = f(n.grouped))
    case n: AggOp => n.copy(grouped = f(n.grouped))
    case n: ReduceOp => n.copy(grouped = f(n.grouped))
    case n: AggregateOp[_] => n.copy(grouped = f(n.grouped))
    case n: SessionAggregateOp[_] => n.copy(grouped = f(n.grouped))
    case n: ProcessOp => n.copy(up = f(n.up))
    case n: TransformOp => n.copy(up = f(n.up))
    case n: JoinOp => n.copy(left = f(n.left), right = f(n.right))
  }
}
