package graft.table

import graft.engine.Registry
import graft.expr.ExprUtils

/** build()-time resolution of string table/feature references and
  * declaration-order dependency validation
  * (ref: python/feathub/feature_views/derived_feature_view.py:123-236).
  */
object Resolver {

  def resolveDerived(v: UnresolvedDerivedFeatureView): DerivedFeatureView = {
    val source = v.source match {
      case TableName(n) => Registry.get(n)
      case TableDesc(d) => d
    }
    val sourceFields = outputFields(source)
    // Names taken so far: source outputs plus features resolved earlier —
    // also feeds default names for map-lookup features (feature.py:31-40).
    var taken = sourceFields.getOrElse(Set.empty)
    val feats = v.features.map { ref =>
      val f = ref match {
        case FeatureDef(f)   => f
        case FeatureStr(s)   => featureFromString(s, source, sourceFields, taken)
      }
      taken += f.name
      f
    }
    validate(feats, sourceFields)
    val resolved = DerivedFeatureView(
      v.name, source, feats, v.keepSourceFields, v.filterExpr, v.keys)
    Registry.register(resolved)
    resolved
  }

  /** Sliding-view resolution: string features must name SOURCE fields
    * (join references are invalid here); the constructed view then runs
    * its own validations (ref: sliding_feature_view.py:160-231).
    */
  def resolveSliding(v: UnresolvedSlidingFeatureView): SlidingFeatureView = {
    val source = v.source match {
      case TableName(n) => Registry.get(n)
      case TableDesc(d) => d
    }
    val sourceFields = outputFields(source)
    val feats = v.features.map {
      case FeatureDef(f) => f
      case FeatureStr(s) =>
        require(s.indexOf('.') < 0 && ExprUtils.isId(s),
          s"SlidingFeatureView feature string '$s' must name a source field " +
            "(join references are not supported in a sliding view)")
        sourceFields.foreach { fields =>
          require(fields.contains(s), s"Feature '$s' is not an output of source ${source.name}")
        }
        Feature(s, ExpressionTransform(s"`$s`"), keys = source.keys)
    }
    val resolved = SlidingFeatureView(
      v.name, source, feats, v.filterExpr,
      v.enableEmptyWindowOutput, v.skipSameWindowOutput,
      v.timestampFieldName, v.outputTimestampFormat)
    Registry.register(resolved)
    resolved
  }

  /** `"f"` → passthrough of a source feature; `"table.f"` → PIT join of a
    * keyed feature from a registered table; `"table.m['k']"` → PIT join of
    * a static map-entry lookup under a generated name
    * (ref: derived_feature_view.py:206-269).
    */
  private def featureFromString(
      s: String,
      source: TableDescriptor,
      sourceFields: Option[Set[String]],
      taken: Set[String]): Feature = {
    val dot = s.indexOf('.')
    if (dot < 0) {
      require(
        ExprUtils.isId(s),
        s"Feature string '$s' without a table qualifier must be a plain feature name")
      sourceFields.foreach { fields =>
        require(fields.contains(s), s"Feature '$s' is not an output of source ${source.name}")
      }
      Feature(s, ExpressionTransform(s"`$s`"), keys = source.keys)
    } else {
      val (tableName, expr) = (s.substring(0, dot), s.substring(dot + 1))
      val table = Registry.get(tableName)
      if (ExprUtils.isId(expr)) {
        val fname = expr.stripPrefix("`").stripSuffix("`")
        val (dtype, fkeys) = table match {
          case dv: DerivedFeatureView =>
            dv.features.find(_.name == fname) match {
              case Some(f) => (f.dtype, f.resolvedKeys.orElse(dv.keys))
              case None    => (None, dv.keys)
            }
          case sv: SlidingFeatureView =>
            (sv.features.find(_.name == fname).flatMap(_.dtype), sv.keys)
          case other => (None, other.keys)
        }
        val keys = fkeys.getOrElse(throw new IllegalArgumentException(
          s"Feature '$fname' in table '$tableName' does not have keys specified"))
        Feature(fname, JoinTransform(tableName, s"`$fname`"), dtype, Some(keys))
      } else if (ExprUtils.isStaticMapLookup(expr)) {
        val keys = table.keys.getOrElse(throw new IllegalArgumentException(
          s"Table '$tableName' does not have keys specified"))
        Feature(defaultName(taken), JoinTransform(tableName, expr), keys = Some(keys))
      } else {
        throw new IllegalArgumentException(
          s"Invalid feature string '$s': expected 'feature', 'table.feature', " +
            "or 'table.map[literal]'")
      }
    }
  }

  /** First `_<index>` not already taken (ref: feature.py:31-40). */
  private def defaultName(taken: Set[String]): String =
    LazyList.from(0).map(i => s"_$i").find(n => !taken.contains(n)).get

  /** Every feature may only depend on source fields or features declared
    * EARLIER in the list (declaration order, not engine phase order)
    * (ref: derived_feature_view.py:171-204).
    */
  private def validate(feats: Seq[Feature], sourceFields: Option[Set[String]]): Unit = {
    // Without static source knowledge (e.g. a MemoryStore/Jdbc source with
    // no declared schema) dependency validation is deferred to build time.
    val fields = sourceFields match {
      case Some(f) => f
      case None    => return
    }
    var valid = fields
    feats.foreach { f =>
      val vars: Set[String] = f.transform match {
        case _: JoinTransform => Set.empty
        case _: UdfTransform  => Set.empty // whole-row UDF: depends on the full row
        case t: OverWindowTransform =>
          ExprUtils.variables(t.expr) ++
            t.filterExpr.map(ExprUtils.variables).getOrElse(Set.empty) ++
            t.groupByKeys
        case t: ExpressionTransform => ExprUtils.variables(t.expr)
        case other =>
          throw new IllegalArgumentException(
            s"Unexpected transform $other of feature ${f.name} in DerivedFeatureView")
      }
      val missing = vars.diff(valid)
      require(
        missing.isEmpty,
        s"Feature ${f.name} should only depend on features declared earlier or " +
          s"source fields; missing: ${missing.mkString(", ")}")
      valid += f.name
    }
  }

  /** Statically-knowable output field names of a descriptor, or None when
    * the schema is only discoverable by reading the table.
    */
  def outputFields(desc: TableDescriptor): Option[Set[String]] = desc match {
    case s: FileSource      => s.schema.map(_.fieldNames.toSet)
    case s: KafkaSource     => Some(s.schema.fieldNames.toSet)
    case s: DataGenSource   => Some(s.fields.map(_.name).toSet)
    case s: DataFrameSource => Some(s.df.columns.toSet)
    case v: DerivedFeatureView =>
      if (v.keepSourceFields)
        outputFields(v.source).map(_ ++ v.features.map(_.name))
      else
        Some((v.resolvedKeys.getOrElse(Nil) ++
          v.timestampField.toSeq ++ v.features.map(_.name)).toSet)
    case v: SlidingFeatureView =>
      Some((v.groupByKeys ++ Seq(v.timestampFieldName) ++ v.features.map(_.name)).toSet)
    case _ => None
  }
}
