package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Rewrites NON-EQUI band joins — `l.t BETWEEN r.t + lo AND r.t + hi`
  * with no equi conjunct — from the nested-loop plan Spark would
  * otherwise produce (O(n·m) comparisons: the scale killer of as-of /
  * proximity / interval workloads) into a BINNED EQUI-JOIN:
  *
  *   - both sides bin their time attribute with bin size B = hi − lo + 1
  *     (integer floor division, so bins are exact);
  *   - a band of width ≤ B spans at most two consecutive bins, so the
  *     probe side generates ≤ 2 bin keys per row (`explode` of the
  *     distinct pair) and the match becomes `bin_l = bin_r` — a plain
  *     hash/sort-merge join — with the ORIGINAL band predicate kept as a
  *     residual filter for exactness;
  *   - the rewritten join carries an equi conjunct, which is also what
  *     makes the rule idempotent (it only fires on joins with none).
  *
  * Supported shape (kept deliberately narrow-and-sound): INNER join whose
  * condition's band conjuncts compare two integral attributes from
  * opposite sides, optionally offset by literals, in any operand order;
  * every other conjunct rides along in the residual filter. Guarded by
  * `spark.graft.bandjoin.rewrite` (default on).
  *
  * Boundary: bin arithmetic (`v + lo`, `v + hi`, `hi − lo + 1`) is Long
  * and assumes it does not overflow — true for the time/sequence domains
  * band joins exist for (epoch micros are 2^50-scale), not for values
  * engineered near Long.MaxValue. The residual filter can only REMOVE
  * rows, so an overflow could only ever cause missed matches, never
  * spurious ones.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** An integral attribute plus a literal offset: a, a+c, c+a, a−c. */
  private object Term {
    def unapply(e: Expression): Option[(Attribute, Long)] = e match {
      case a: Attribute if integral(a.dataType) => Some((a, 0L))
      case Add(Term((a, c)), Literal(v, t), _) if integral(t) => Some((a, c + toLong(v)))
      case Add(Literal(v, t), Term((a, c)), _) if integral(t) => Some((a, c + toLong(v)))
      case Subtract(Term((a, c)), Literal(v, t), _) if integral(t) => Some((a, c - toLong(v)))
      case _ => None
    }
  }

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def toLong(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  /** A conjunct as a bound on (a1 − a2): Lower(c) means a1 − a2 ≥ c,
    * Upper(c) means a1 − a2 ≤ c — strict forms tightened by 1 (integral).
    */
  private sealed trait Bound { def a1: Attribute; def a2: Attribute; def c: Long }
  private case class Lower(a1: Attribute, a2: Attribute, c: Long) extends Bound
  private case class Upper(a1: Attribute, a2: Attribute, c: Long) extends Bound

  private def asBound(e: Expression): Option[Bound] = e match {
    case GreaterThanOrEqual(Term((a1, c1)), Term((a2, c2))) => Some(Lower(a1, a2, c2 - c1))
    case GreaterThan(Term((a1, c1)), Term((a2, c2))) => Some(Lower(a1, a2, c2 - c1 + 1))
    case LessThanOrEqual(Term((a1, c1)), Term((a2, c2))) => Some(Upper(a1, a2, c2 - c1))
    case LessThan(Term((a1, c1)), Term((a2, c2))) => Some(Upper(a1, a2, c2 - c1 - 1))
    case _ => None
  }

  /** Exact floor(x / b) over longs: subtract the non-negative Pmod first
    * so the integral divide is exact for negative values too.
    */
  private def floorDiv(x: Expression, b: Long): Expression = {
    val lx = Cast(x, LongType)
    val lb = Literal(b, LongType)
    IntegralDivide(Subtract(lx, Pmod(lx, lb)), lb)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.bandjoin.rewrite", "true").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            // both sides must actually reference columns: a literal's empty
            // reference set is a subset of EVERY outputSet, and `col = lit`
            // is a filter, not an equi-join key
            a.references.nonEmpty && b.references.nonEmpty &&
              (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) ||
                a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
          case _ => false
        }
        if (hasEqui) j
        else {
          // normalize every band conjunct to a bound on (u − v) with
          // u from the LEFT side and v from the RIGHT side
          def sideOf(a: Attribute): Option[Boolean] = // true = left
            if (left.outputSet.contains(a)) Some(true)
            else if (right.outputSet.contains(a)) Some(false)
            else None
          val normalized: Seq[Option[Bound]] = conjuncts.map { e =>
            asBound(e).flatMap { b =>
              (sideOf(b.a1), sideOf(b.a2)) match {
                case (Some(true), Some(false)) => Some(b)
                case (Some(false), Some(true)) => b match {
                  // a1 − a2 ≥ c with a1 on the right ⟺ u − v ≤ −c
                  case Lower(a1, a2, c) => Some(Upper(a2, a1, -c))
                  case Upper(a1, a2, c) => Some(Lower(a2, a1, -c))
                }
                case _ => None
              }
            }
          }
          val bounds = normalized.flatten
          // one (u, v) attribute pair carrying both a lower and an upper bound
          val pairs = bounds.groupBy(b => (b.a1.exprId, b.a2.exprId))
          pairs.collectFirst {
            case (_, bs)
                if bs.exists(_.isInstanceOf[Lower]) && bs.exists(_.isInstanceOf[Upper]) &&
                  bs.collect { case Lower(_, _, c) => c }.max <=
                    bs.collect { case Upper(_, _, c) => c }.min =>
              bs
          } match {
            case None => j
            case Some(bs) =>
              val u = bs.head.a1
              val v = bs.head.a2
              val lo = bs.collect { case Lower(_, _, c) => c }.max
              val hi = bs.collect { case Upper(_, _, c) => c }.min
              val bin = math.max(hi - lo + 1, 1L)
              val binL = Alias(floorDiv(u, bin), "__band_bin")()
              val left2 = Project(left.output :+ binL, left)
              val gen = Explode(ArrayDistinct(CreateArray(Seq(
                floorDiv(Add(Cast(v, LongType), Literal(lo, LongType)), bin),
                floorDiv(Add(Cast(v, LongType), Literal(hi, LongType)), bin)))))
              val binR = AttributeReference("__band_bin_r", LongType, nullable = true)()
              val right2 = Generate(gen, unrequiredChildIndex = Nil, outer = false,
                qualifier = None, generatorOutput = Seq(binR), child = right)
              val newCond = (EqualTo(binL.toAttribute, binR) +: conjuncts).reduce(And)
              Project(left.output ++ right.output,
                Join(left2, right2, Inner, Some(newCond), hint))
          }
        }
    }
  }
}
