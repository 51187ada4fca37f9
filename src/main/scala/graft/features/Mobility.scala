package graft.features

import graft.core.TrajSchema
import graft.kernels.Geo
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity mobility summary features — the compact descriptors of "how
  * an entity moves" used across the mobility-mining literature (González
  * et al., "Understanding individual human mobility patterns", Nature
  * 2008; Song et al., "Limits of predictability in human mobility"):
  *
  *   - `rg_m` — radius of gyration: √(mean over points of haversine²(p,
  *     centroid)) in metres; how far the entity ranges around its center
  *     of mass.
  *   - `entropy_nats` — Shannon entropy (natural log) of the entity's
  *     visit distribution over `cellDeg`-degree grid cells; 0 = always
  *     the same cell.
  *   - `n_cells` — distinct cells visited; `n_points` — observations.
  *
  * These compose with the kinematic chain: kinematics describe steps,
  * mobility features describe the whole entity — the per-entity row a
  * classifier or cohort analysis consumes.
  *
  * Scale shape: TWO aggregates over the entity clustering and a tiny
  * per-entity join. The centroid rides a whole-partition window on the
  * SAME hash clustering the final aggregate groups on (one exchange,
  * reused); the cell histogram is a map-side-combinable (entity, cell)
  * count whose per-entity normalizer is a window over the TINY histogram
  * (|cells| rows), never the point grid. No step is O(points²) and no
  * driver collection occurs. */
object Mobility {

  def withMobility(df: DataFrame, s: TrajSchema, cellDeg: Double = 0.01): DataFrame = {
    require(cellDeg > 0.0, s"cellDeg must be positive, got $cellDeg")
    val wAll = Window.partitionBy(s.idCol)
    // radius of gyration: centroid via the whole-partition frame, then the
    // mean squared great-circle distance to it
    val centLat = avg(s.latCol).over(wAll)
    val centLon = avg(s.lonCol).over(wAll)
    val d = Geo.haversine(s.latCol, s.lonCol, centLat, centLon)
    val rg = df
      .select(s.idCol, (d * d).as("_d2"))
      .groupBy(s.idCol)
      .agg(count(lit(1)).as("n_points"), sqrt(avg(col("_d2"))).as("rg_m"))
    // visit distribution over grid cells → entropy + coverage
    val cells = df
      .groupBy(s.idCol,
        floor(s.latCol / cellDeg).cast("long").as("_cx"),
        floor(s.lonCol / cellDeg).cast("long").as("_cy"))
      .agg(count(lit(1)).as("_nc"))
    val p = col("_nc").cast("double") / sum(col("_nc")).over(Window.partitionBy(s.idCol)).cast("double")
    val ent = cells
      .select(s.idCol, p.as("_p"))
      .groupBy(s.idCol)
      .agg((-sum(col("_p") * log(col("_p")))).as("entropy_nats"), count(lit(1)).as("n_cells"))
    rg.join(ent, s.id)
      .select(s.idCol, col("n_points"), col("rg_m"), col("entropy_nats"), col("n_cells"))
  }
}
