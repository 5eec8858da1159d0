package graft.als

/** Normal-equation accumulator for one least-squares subproblem.
  *
  * Accumulates `AᵀA` (as a packed upper-triangular array of k(k+1)/2
  * doubles, row-major over the upper triangle: (i,j) with j >= i at
  * position i*k - i*(i-1)/2 + (j - i)) and `Aᵀb` (dense length-k).
  *
  * Behavior matched against the reference's `Solver.py:18-63`
  * (`NormalEquation.add` = rank-1 `dspr` update + `daxpy`, `merge` = two
  * vector adds, `reset` = zero-fill). Implemented as plain Scala loops over
  * primitive arrays — at the ranks ALS uses (8-128) the JIT vectorizes these
  * and there is no BLAS-call overhead per rating.
  */
final class NormalEquation(val k: Int) extends Serializable {
  require(k > 0, s"rank must be positive, got $k")
  val triK: Int = k * (k + 1) / 2
  /** packed upper-triangular Gramian, row-major upper layout */
  val ata: Array[Double] = new Array[Double](triK)
  /** Aᵀb */
  val atb: Array[Double] = new Array[Double](k)

  /** Adds an observation (a, b) with confidence weight c:
    * `ata += c * a aᵀ`, `atb += b * a`. Reference: `Solver.py:31-48`.
    */
  def add(a: Array[Float], b: Double, c: Double = 1.0): this.type = {
    require(c >= 0.0, s"confidence must be nonnegative, got $c")
    require(a.length == k, s"dimension mismatch: ${a.length} != $k")
    var i = 0
    var pos = 0
    while (i < k) {
      val ci = c * a(i)
      var j = i
      while (j < k) {
        ata(pos) += ci * a(j)
        pos += 1
        j += 1
      }
      i += 1
    }
    if (b != 0.0) {
      var i2 = 0
      while (i2 < k) { atb(i2) += b * a(i2); i2 += 1 }
    }
    this
  }

  /** Merges another accumulator of the same rank. Reference: `Solver.py:50-59`. */
  def merge(other: NormalEquation): this.type = {
    require(other.k == k, s"rank mismatch: ${other.k} != $k")
    var i = 0
    while (i < triK) { ata(i) += other.ata(i); i += 1 }
    i = 0
    while (i < k) { atb(i) += other.atb(i); i += 1 }
    this
  }

  /** Zero-fills both accumulators. Reference: `Solver.py:61-63`. */
  def reset(): Unit = {
    java.util.Arrays.fill(ata, 0.0)
    java.util.Arrays.fill(atb, 0.0)
  }
}

/** Strategy interface for solving one accumulated normal equation.
  * Reference: `Solver.py:69-75`. Implementations must reset `ne` on return.
  *
  * THREADING CONTRACT: implementations carry mutable scratch that is reused
  * across `solve` calls, so a solver instance is single-owner — exactly one
  * thread may ever call `solve` on it. Inside `BlockedALS` this holds by
  * construction (each task deserializes its own private copy from the task
  * closure), but a driver-local caller sharing one instance across threads
  * (e.g. a parallel fold-in) would corrupt factors silently. Set
  * `GRAFT_SOLVER_THREAD_ASSERT=1` to turn the contract into a hard check.
  */
trait LeastSquaresNESolver extends Serializable {
  /** Solves `(AᵀA + λI) x = Aᵀb` and resets `ne`. */
  def solve(ne: NormalEquation, lambda: Double): Array[Float]

  @transient private var ownerThread: Long = 0L

  /** Opt-in single-owner check (`GRAFT_SOLVER_THREAD_ASSERT=1`): first call
    * binds the instance to the calling thread, later calls from any other
    * thread throw. Zero-cost when the env flag is unset.
    */
  protected final def assertSingleOwner(): Unit =
    if (LeastSquaresNESolver.assertEnabled) {
      val t = Thread.currentThread().getId
      if (ownerThread == 0L) ownerThread = t
      else if (ownerThread != t)
        throw new IllegalStateException(
          s"solver instance shared across threads ($ownerThread then $t): " +
            "LeastSquaresNESolver scratch is single-owner; use one instance per thread")
    }
}

object LeastSquaresNESolver {
  /** var (not val) only so specs can exercise the assert without forking a
    * JVM with the env flag; production code never writes it.
    */
  private[als] var assertEnabled: Boolean =
    sys.env.get("GRAFT_SOLVER_THREAD_ASSERT").contains("1")
}

/** Cholesky solve of the regularized normal equations.
  *
  * Unlike the reference (`Solver.py:118-153`), which silently returns `Aᵀb`
  * when the matrix is not positive definite, this fails fast — with λ > 0 the
  * regularized Gramian is PD, so a failure indicates NaN/Inf input and must
  * not be masked.
  */
final class CholeskySolver extends LeastSquaresNESolver {

  // Scratch reused ACROSS solves: the k×k unpack below overwrites every
  // cell (each (i, j≥i) writes both mirror cells) and the rhs is copied in
  // full, so no zeroing is needed between entities — without this, a
  // rank-64 ×100 half-step allocates ~32 KB × 1.75M entities of
  // JVM-zeroed dense scratch per iteration. A solver instance reaches each
  // task by closure DESERIALIZATION (one private copy per task), so the
  // mutable state is single-threaded; @transient so the empty driver-side
  // arrays are never shipped.
  @transient private var scratchA: Array[Double] = _
  @transient private var scratchB: Array[Double] = _

  override def solve(ne: NormalEquation, lambda: Double): Array[Float] = {
    assertSingleOwner()
    val k = ne.k
    if (scratchA == null || scratchA.length != k * k) {
      scratchA = new Array[Double](k * k)
      scratchB = new Array[Double](k)
    }
    // dense symmetric matrix from packed upper + λ on the diagonal
    // (reference: fill_ata, Solver.py:155-166)
    val a = scratchA
    var pos = 0
    var i = 0
    while (i < k) {
      var j = i
      while (j < k) {
        val v = ne.ata(pos)
        a(i * k + j) = v
        a(j * k + i) = v
        pos += 1
        j += 1
      }
      a(i * k + i) += lambda
      i += 1
    }
    System.arraycopy(ne.atb, 0, scratchB, 0, k)
    val x = CholeskySolver.solveInPlace(a, scratchB, k)
    ne.reset()
    val out = new Array[Float](k)
    i = 0
    while (i < k) { out(i) = x(i).toFloat; i += 1 }
    out
  }
}

object CholeskySolver {
  /** In-place Cholesky factorization (lower) + forward/back substitution.
    * O(k³/6); k is the ALS rank so this is microseconds.
    */
  private[als] def solveInPlace(a: Array[Double], b: Array[Double], k: Int): Array[Double] = {
    // factor: a = L Lᵀ, storing L in the lower triangle of `a`
    var j = 0
    while (j < k) {
      var s = a(j * k + j)
      var p = 0
      while (p < j) { val l = a(j * k + p); s -= l * l; p += 1 }
      if (s <= 0.0 || s.isNaN)
        throw new ArithmeticException(
          s"Cholesky failed at pivot $j (value $s): Gramian not positive definite; " +
            "input factors likely contain NaN/Inf")
      val ljj = math.sqrt(s)
      a(j * k + j) = ljj
      var i = j + 1
      while (i < k) {
        var t = a(i * k + j)
        var q = 0
        while (q < j) { t -= a(i * k + q) * a(j * k + q); q += 1 }
        a(i * k + j) = t / ljj
        i += 1
      }
      j += 1
    }
    // forward solve L y = b
    var i = 0
    while (i < k) {
      var t = b(i)
      var q = 0
      while (q < i) { t -= a(i * k + q) * b(q); q += 1 }
      b(i) = t / a(i * k + i)
      i += 1
    }
    // back solve Lᵀ x = y
    i = k - 1
    while (i >= 0) {
      var t = b(i)
      var q = i + 1
      while (q < k) { t -= a(q * k + i) * b(q); q += 1 }
      b(i) = t / a(i * k + i)
      i -= 1
    }
    b
  }
}

/** Nonnegative least squares via projected-gradient conjugate gradient
  * (Polyak 1969), the same public algorithm family MLlib's NNLS uses.
  * The reference delegates to `scipy.optimize.nnls` (`Solver.py:95-101`,
  * with the bug that it returns scipy's `(x, rnorm)` tuple); on the JVM we
  * solve `min ‖Ax − b‖² s.t. x ≥ 0` directly on the Gramian.
  */
final class NNLSSolver extends LeastSquaresNESolver {

  // Same per-entity allocation-churn fix as [[CholeskySolver]] (SCALING
  // §12.14): the dense unpack overwrites every cell and the CG workspace
  // is zero-initialized by NNLS.solve itself, so reuse is free; task
  // closures deserialize private solver copies, so single-threaded.
  @transient private var scratchAta: Array[Double] = _
  @transient private var scratchAtb: Array[Double] = _
  @transient private var ws: NNLS.Workspace = _

  override def solve(ne: NormalEquation, lambda: Double): Array[Float] = {
    assertSingleOwner()
    val k = ne.k
    if (scratchAta == null || scratchAta.length != k * k) {
      scratchAta = new Array[Double](k * k)
      scratchAtb = new Array[Double](k)
      ws = new NNLS.Workspace(k)
    }
    val ata = scratchAta
    var pos = 0
    var i = 0
    while (i < k) {
      var j = i
      while (j < k) {
        val v = ne.ata(pos)
        ata(i * k + j) = v
        ata(j * k + i) = v
        pos += 1
        j += 1
      }
      ata(i * k + i) += lambda
      i += 1
    }
    System.arraycopy(ne.atb, 0, scratchAtb, 0, k)
    val x = NNLS.solve(ata, scratchAtb, k, ws)
    ne.reset()
    val out = new Array[Float](k)
    i = 0
    while (i < k) { out(i) = x(i).toFloat; i += 1 }
    out
  }
}

/** Projected-gradient CG solver for `min ½xᵀMx − qᵀx, x ≥ 0` with M PSD.
  * Fresh implementation of the classical Polyak projected-CG scheme.
  *
  * Package-private: when a [[Workspace]] is passed, `solve` returns the
  * workspace-owned `ws.x` buffer — zero-filled and overwritten by the next
  * solve on the same workspace — so callers must copy before the next call
  * (NNLSSolver copies to Float immediately). Keeping the object
  * `private[als]` confines that aliasing contract to this package.
  */
private[als] object NNLS {

  private def mulAdd(m: Array[Double], x: Array[Double], out: Array[Double], k: Int): Unit = {
    var i = 0
    while (i < k) {
      var s = 0.0
      var j = 0
      val row = i * k
      while (j < k) { s += m(row + j) * x(j); j += 1 }
      out(i) = s
      i += 1
    }
  }

  private def dot(a: Array[Double], b: Array[Double], k: Int): Double = {
    var s = 0.0; var i = 0
    while (i < k) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Reusable CG workspace — every member is (re)initialized by `solve`
    * before its first read (`x` by the explicit zero-fill, the rest by
    * full overwrites), so one instance serves any number of solves.
    */
  final class Workspace(k: Int) {
    val x = new Array[Double](k)
    val grad = new Array[Double](k)
    val dir = new Array[Double](k)
    val scratch = new Array[Double](k)
  }

  /** Solves min ½ xᵀ ata x − atb·x subject to x ≥ 0. `ata` is k×k dense.
    * With `ws != null` the result IS `ws.x` (invalidated by the next solve
    * on that workspace); with `ws == null` the caller owns a fresh array.
    */
  def solve(ata: Array[Double], atb: Array[Double], k: Int,
      ws: Workspace = null): Array[Double] = {
    val w = if (ws == null) new Workspace(k) else ws
    val x = w.x                       // iterate, starts at 0 (feasible)
    java.util.Arrays.fill(x, 0.0)
    val grad = w.grad                 // Mx − q
    val dir = w.dir                   // search direction
    val scratch = w.scratch
    var lastNorm = 0.0
    var iterno = 0
    var lastWall = 0 // iterations since last CG restart
    val maxIter = k * 3 + 20
    while (iterno < maxIter) {
      // grad = ata * x - atb
      mulAdd(ata, x, grad, k)
      var i = 0
      while (i < k) { grad(i) -= atb(i); i += 1 }
      // project gradient: zero where x_i == 0 and grad_i > 0 (moving further
      // negative is blocked by the constraint)
      var ngrad = 0.0
      i = 0
      while (i < k) {
        val g = if (x(i) == 0.0 && grad(i) > 0.0) 0.0 else grad(i)
        scratch(i) = g
        ngrad += g * g
        i += 1
      }
      if (ngrad < 1e-14) return x
      // CG direction with restart when the active set changed materially
      if (lastWall == 0 || lastNorm == 0.0) {
        i = 0
        while (i < k) { dir(i) = -scratch(i); i += 1 }
      } else {
        val beta = ngrad / lastNorm
        i = 0
        while (i < k) { dir(i) = -scratch(i) + beta * dir(i); i += 1 }
      }
      lastNorm = ngrad
      // zero direction components pushing into the boundary
      i = 0
      while (i < k) {
        if (x(i) == 0.0 && dir(i) < 0.0) dir(i) = 0.0
        i += 1
      }
      // exact line step for the quadratic: α = −gᵀd / dᵀMd
      mulAdd(ata, dir, scratch, k)
      val dMd = dot(dir, scratch, k)
      if (dMd <= 0.0) return x
      var alpha = -dot(grad, dir, k) / dMd
      if (alpha <= 0.0) return x
      // clip α at the first boundary crossing; a clip deactivates CG memory
      var clipped = false
      i = 0
      while (i < k) {
        if (dir(i) < 0.0) {
          val bound = -x(i) / dir(i)
          if (bound < alpha) { alpha = bound; clipped = true }
        }
        i += 1
      }
      i = 0
      while (i < k) {
        x(i) = math.max(0.0, x(i) + alpha * dir(i))
        i += 1
      }
      lastWall = if (clipped) 0 else lastWall + 1
      if (lastWall > k) lastWall = 0 // periodic restart
      iterno += 1
    }
    x
  }
}
