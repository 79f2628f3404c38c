package graft.pipeline

import java.net.URI
import javax.tools.{Diagnostic, DiagnosticCollector, JavaFileObject,
  SimpleJavaFileObject, ToolProvider}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Encoders}

/** X4 script stage, for real: the reference runs arbitrary USER-AUTHORED
  * script in its Spark jobs via a JSR-223 engine
  * (`aleph2_analytic_services_spark/.../assets/SparkJsInterpreterTopology.java:123-160`
  * — Nashorn, removed from Java 17). This is the JVM-native re-expression:
  * user-supplied JAVA SOURCE is compiled AT RUNTIME with the JDK's own
  * `javax.tools.JavaCompiler` (in-memory, no files, no extra deps) into a
  * `java.util.function.Function<String, String>` record mapper, and the
  * compiled CLASS BYTES — not the source — ship to executors where a
  * per-JVM classloader cache defines them once per stage. Complementing
  * [[ExprStage]] (runtime-authored Catalyst expressions, optimizer-visible),
  * this covers the arbitrary-imperative-logic half of the script contract:
  * loops, state, helper classes — anything Java — at full JIT speed rather
  * than interpreter speed.
  *
  * Scale shape: compilation happens ONCE on the driver; the class bytes
  * ship as a Spark BROADCAST (once per executor, not per task) and the
  * user function runs inside `mapPartitions` (narrow, no shuffle). The
  * classloader cache key is the bytes' content hash and the cache is a
  * small LRU, so repeated stages / task retries never redefine classes,
  * different sources coexist, and iterating on source in a long-lived
  * session can't leak metaspace without bound.
  *
  * Trust model: identical to the reference's script stage — the source
  * runs with the executor's privileges, so whoever may submit a stage may
  * run code on the cluster. Gate at job-submission level (as the reference
  * does for its JS), not here.
  */
object JavaStage {

  /** In-memory compile of one compilation unit; returns EVERY emitted class
    * (inner/anonymous classes included) as name → bytes.
    * Fails fast with the compiler's own diagnostics. */
  def compile(className: String, source: String): Map[String, Array[Byte]] = {
    val compiler = Option(ToolProvider.getSystemJavaCompiler).getOrElse(
      sys.error("no system Java compiler (JRE instead of JDK?)"))
    val diags = new DiagnosticCollector[JavaFileObject]
    val srcObj = new SimpleJavaFileObject(
        URI.create(s"string:///${className.replace('.', '/')}.java"),
        JavaFileObject.Kind.SOURCE) {
      override def getCharContent(ignore: Boolean): CharSequence = source
    }
    val out = mutable.Map.empty[String, java.io.ByteArrayOutputStream]
    val stdFm = compiler.getStandardFileManager(diags, null, null)
    val fm = new javax.tools.ForwardingJavaFileManager[javax.tools.JavaFileManager](stdFm) {
      override def getJavaFileForOutput(loc: javax.tools.JavaFileManager.Location,
          name: String, kind: JavaFileObject.Kind,
          sibling: javax.tools.FileObject): JavaFileObject =
        new SimpleJavaFileObject(
            URI.create(s"bytes:///${name.replace('.', '/')}.class"), kind) {
          override def openOutputStream(): java.io.OutputStream = {
            val bos = new java.io.ByteArrayOutputStream()
            out(name) = bos
            bos
          }
        }
    }
    val ok =
      try compiler.getTask(null, fm, diags, null, null,
        java.util.List.of(srcObj)).call()
      finally fm.close() // javac's call() can throw; don't leak the manager
    if (!ok) {
      val msgs = diags.getDiagnostics.asScala
        .filter(_.getKind == Diagnostic.Kind.ERROR)
        .map(d => s"line ${d.getLineNumber}: ${d.getMessage(null)}")
      sys.error(s"user stage source failed to compile:\n${msgs.mkString("\n")}")
    }
    out.view.mapValues(_.toByteArray).toMap
  }

  /** Executor-side class cache: one defined classloader per distinct class-
    * bytes bundle per JVM (content-hashed), shared across tasks/retries.
    * Bounded LRU: iterating on stage source in a long-lived session makes
    * new bundles; unbounded retention would leak metaspace. */
  private val MaxLoaders = 64
  private val loaderCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, ClassLoader](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, ClassLoader]): Boolean =
          size() > MaxLoaders
      })

  private def bundleKey(classes: Map[String, Array[Byte]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    classes.toSeq.sortBy(_._1).foreach { case (n, b) =>
      md.update(n.getBytes("UTF-8")); md.update(b)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private def loaderFor(classes: Map[String, Array[Byte]]): ClassLoader =
    loaderCache.computeIfAbsent(bundleKey(classes), _ =>
      // CHILD-FIRST for bundle names: a user class whose name collides with
      // something on the executor classpath must load the USER bytes, not
      // silently resolve to the classpath twin
      new ClassLoader(getClass.getClassLoader) {
        override protected def loadClass(name: String, resolve: Boolean): Class[_] =
          getClassLoadingLock(name).synchronized {
            val c = Option(findLoadedClass(name)).getOrElse {
              classes.get(name) match {
                case Some(b) => defineClass(name, b, 0, b.length)
                case None => super.loadClass(name, false)
              }
            }
            if (resolve) resolveClass(c)
            c
          }
      })

  /** Instantiate the user mapper from shipped class bytes (used inside
    * tasks; public for the spec). */
  def instantiate(className: String,
      classes: Map[String, Array[Byte]]): java.util.function.Function[String, String] =
    instantiateRaw(className, classes)
      .asInstanceOf[java.util.function.Function[String, String]]

  private def instantiateRaw(className: String,
      classes: Map[String, Array[Byte]]): AnyRef =
    loaderFor(classes).loadClass(className)
      .getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]

  /** Shared plan-time prologue of every String-consuming stage form
    * ([[stage]]/[[flatStage]]/[[filterStage]]): every misuse surfaces
    * HERE, on the driver, before any Spark job — the stage's whole error
    * contract (like the compile diagnostics). */
  private def inPrologue(df: DataFrame, inCol: String,
      className: String, source: String)
      : (org.apache.spark.broadcast.Broadcast[Map[String, Array[Byte]]], Int) = {
    require(df.schema(inCol).dataType == org.apache.spark.sql.types.StringType,
      s"$inCol must be STRING (the user function consumes String); " +
        s"got ${df.schema(inCol).dataType.simpleString}")
    val classes = compile(className, source) // driver-side, once
    (df.sparkSession.sparkContext.broadcast(classes),
      df.schema.fieldIndex(inCol))
  }

  /** [[inPrologue]] + the mapper forms' output-column half. */
  private def prologue(df: DataFrame, inCol: String, outCol: String,
      className: String, source: String)
      : (org.apache.spark.broadcast.Broadcast[Map[String, Array[Byte]]], Int,
         org.apache.spark.sql.Encoder[org.apache.spark.sql.Row]) = {
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists in the input schema")
    val (bcClasses, inIdx) = inPrologue(df, inCol, className, source)
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        org.apache.spark.sql.types.StructField(outCol,
          org.apache.spark.sql.types.StringType))
    (bcClasses, inIdx, Encoders.row(outSchema))
  }

  /** The stage: compile `source` (a public class `className` implementing
    * `java.util.function.Function<String,String>`) and map `inCol` through
    * it as `outCol`. Compile errors surface at PLAN time on the driver with
    * javac's diagnostics, not per-task. NULL input follows the engine-wide
    * contract: null in → null out, the user function never sees it. */
  def stage(df: DataFrame, inCol: String, outCol: String,
      className: String, source: String): DataFrame = {
    val (bcClasses, inIdx, enc0) = prologue(df, inCol, outCol, className, source)
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] = enc0
    df.mapPartitions { it =>
      lazy val fn = instantiate(className, bcClasses.value) // per-JVM cached loader
      it.map { r =>
        val in = r.getString(inIdx)
        val mapped = if (in == null) null else fn.apply(in)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ mapped)
      }
    }
  }

  /** The FILTER form of the user-code contract (the quality-gate shape
    * x11 gives user JS): user class implements
    * `java.util.function.Predicate<String>` over `inCol`; rows whose
    * predicate returns false are dropped. NULL input follows the
    * engine-wide skip contract: the predicate never sees null, the row is
    * dropped (x11's falsy-null rule). Same driver-compile /
    * broadcast-bytes / per-JVM loader-cache machinery as [[stage]];
    * stateless and narrow, so it drops into streaming append mode
    * unchanged (q:st24 runs this exact path). */
  def filterStage(df: DataFrame, inCol: String,
      className: String, source: String): DataFrame = {
    val (bcClasses, inIdx) = inPrologue(df, inCol, className, source)
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      Encoders.row(df.schema)
    df.mapPartitions { it =>
      lazy val p = instantiatePredicate(className, bcClasses.value)
      it.filter { r =>
        val in = r.getString(inIdx)
        in != null && p.test(in)
      }
    }
  }

  /** Executor-side: the user Predicate from shipped bytes. */
  def instantiatePredicate(className: String,
      classes: Map[String, Array[Byte]]): java.util.function.Predicate[String] =
    instantiateRaw(className, classes)
      .asInstanceOf[java.util.function.Predicate[String]]

  /** The REDUCE half of the user-code contract (X2's grouped combine, the
    * way [[stage]] is X4's map): user class implements
    * `java.util.function.BinaryOperator<String>` and folds each key's
    * values to one. Runs through `reduceGroups`, whose `ReduceAggregator`
    * does MAP-SIDE partial merges — the user function IS the combiner, so
    * it must be associative AND commutative (Spark fixes neither the fold
    * order nor the partitioning; the A4 combiner-eligibility contract
    * applies to user Java exactly as it does to declarative reduces).
    * NULL values are dropped before the fold (the user function never
    * sees null; a key with only nulls disappears). Same driver-compile /
    * broadcast-bytes / per-JVM loader-cache machinery as [[stage]]. */
  def reduceStage(df: DataFrame, keyCol: String, valCol: String,
      className: String, source: String): DataFrame = {
    require(df.schema(keyCol).dataType == org.apache.spark.sql.types.StringType &&
        df.schema(valCol).dataType == org.apache.spark.sql.types.StringType,
      s"$keyCol and $valCol must be STRING (the user reducer folds " +
        s"Strings); got ${df.schema(keyCol).dataType.simpleString}/" +
        df.schema(valCol).dataType.simpleString)
    val classes = compile(className, source) // driver-side, once
    val bcClasses = df.sparkSession.sparkContext.broadcast(classes)
    val pairEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    val holder = new ReducerHolder(className, bcClasses)
    df.select(df(keyCol), df(valCol)).filter(df(valCol).isNotNull)
      .as[(String, String)](pairEnc)
      .groupByKey(_._1)(Encoders.STRING)
      .mapValues(_._2)(Encoders.STRING)
      .reduceGroups(holder.fold _)
      .toDF(keyCol, valCol)
  }

  /** Executor-side: the user BinaryOperator from shipped bytes (loader is
    * per-JVM cached, so this is a map lookup after the first task). */
  def instantiateOperator(className: String,
      classes: Map[String, Array[Byte]]): java.util.function.BinaryOperator[String] =
    instantiateRaw(className, classes)
      .asInstanceOf[java.util.function.BinaryOperator[String]]

  /** Serializable capture for the reduce closure: the operator is
    * instantiated lazily ONCE per deserialized task instance, not per
    * fold call (per-call reflection + a synchronized loader lookup would
    * be per-row overhead in the hot merge path). */
  private final class ReducerHolder(className: String,
      bc: org.apache.spark.broadcast.Broadcast[Map[String, Array[Byte]]])
      extends Serializable {
    @transient private lazy val op = instantiateOperator(className, bc.value)
    def fold(a: String, b: String): String = op.apply(a, b)
  }

  /** The EMIT-CALLBACK form of the script contract (the reference's JS
    * stage emits 0..N records per input): user class implements
    * `java.util.function.Function<String, java.util.List<String>>`; each
    * emitted string becomes one output row alongside the input's other
    * columns. Same compile/broadcast/loader machinery as [[stage]]; NULL
    * input emits nothing. */
  def flatStage(df: DataFrame, inCol: String, outCol: String,
      className: String, source: String): DataFrame = {
    val (bcClasses, inIdx, enc0) = prologue(df, inCol, outCol, className, source)
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] = enc0
    df.mapPartitions { it =>
      lazy val fn = instantiateRaw(className, bcClasses.value)
        .asInstanceOf[java.util.function.Function[String, java.util.List[String]]]
      it.flatMap { r =>
        val in = r.getString(inIdx)
        // null input OR a null returned list = 0 emits (emit-callback
        // style commonly returns null to mean "skip")
        val emitted = if (in == null) null else fn.apply(in)
        if (emitted == null) Iterator.empty
        else {
          val base = r.toSeq
          emitted.iterator().asScala.map(e =>
            org.apache.spark.sql.Row.fromSeq(base :+ e))
        }
      }
    }
  }
}
