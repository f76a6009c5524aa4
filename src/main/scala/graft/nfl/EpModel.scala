package graft.nfl

import org.apache.spark.sql.DataFrame
import graft.ml.GbdtScorer

/** Expected-points GBDT surface (M2, `play_eppa_cpu.py:86-87,136-150`):
  * a 7-class softprob ensemble over post-play state, EP = Σ p·epvals with
  * epvals = [7,-7,3,-3,2,-2,0] (TD, opp TD, FG, opp FG, safety, opp
  * safety, no score — `play_eppa_cpu.py:136`).
  *
  * The reference's trained EP artifact is NOT shipped in its checkout:
  * `play_eppa_cpu.py:84` loads
  * `analysis/models/in/epa_model_rishav_no_time.model` via joblib and
  * `play_eppa_cpu.py:87` dlopens a compiled treelite
  * `epa_no_time_mymodel.so`, but neither file exists anywhere under the
  * reference tree — `analysis/models/in/` ships only the xyac artifacts
  * (`xyac_model.model`, which we DO parse for real in
  * [[graft.nfl.XyacModel]]) plus the L/T prior tables. A full-tree
  * `find` for `*epa*`/`*.joblib` confirms only the path *string* exists,
  * in source. There is consequently no byte stream to point
  * `XgbBinary.indexOfMagic` at, and no EP training labels in the repo to
  * re-train from. We therefore ship a small hand-authored fixture
  * ensemble in the standard XGBoost text-dump format — same 7-class
  * structure, same feature surface, same scoring path (`GbdtScorer`) a
  * real dump would use. Swapping in a real model is
  * `EpModel.load(path)`, which auto-detects the xgboost binary format
  * (and scans for an embedded binary inside a pickle/joblib wrapper)
  * before falling back to the text-dump parser.
  */
object EpModel {

  val EpValues: Array[Double] = EpaModel.EpValues

  /** Model feature surface: the post-play state the EPA state machine
    * derives (`EpaModel.catchState/incompleteState`). Mirrors the
    * reference's `epa_model.feature_names` (down dummies + field state,
    * no-time variant — `Rishav's xyac.ipynb` cell 21 drops
    * half_seconds_remaining). */
  val FeatureNames: Seq[String] = Seq(
    "yardline_100", "ydstogo",
    "down1", "down2", "down3", "down4", "down5", "isFirstDown")

  /** Post-state columns of the EPA state machine, in model-feature order. */
  val PostStateCols: Seq[String] = Seq(
    "yardline_100_post", "ydstogo_post",
    "down1", "down2", "down3", "down4", "down5", "isFirstDown")

  def load(path: String): GbdtScorer.Model = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    if (graft.ml.XgbBinary.looksBinary(bytes))
      graft.ml.XgbBinary.parse(bytes, FeatureNames)
    else GbdtScorer.parseFile(path, FeatureNames, EpValues.length)
  }

  /** Column transformer for `EpaModel.epaTable`: appends `xep` = EP
    * expectation over the post-state columns. */
  def scorer(model: GbdtScorer.Model): DataFrame => DataFrame =
    df => GbdtScorer.withExpectation(df, model, EpValues, PostStateCols, "xep")

  /** Hand-authored fixture: 2 rounds × 7 classes. Round 1 encodes field
    * position (TD mass rises near the goal line, opponent-score mass when
    * backed up), round 2 down/distance. Margins chosen so EP is monotone
    * decreasing in yardline_100 and spans roughly [-2, 5.5] — the shape a
    * real EP curve has. */
  val FixtureDump: String =
    """booster[0]:
      |0:[yardline_100<50] yes=1,no=2,missing=1
      |	1:[yardline_100<20] yes=3,no=4,missing=3
      |		3:[yardline_100<10] yes=5,no=6,missing=5
      |			5:leaf=2.5
      |			6:leaf=2.0
      |		4:leaf=1.0
      |	2:leaf=-0.5
      |booster[1]:
      |0:[yardline_100<80] yes=1,no=2,missing=1
      |	1:leaf=-0.5
      |	2:leaf=0.5
      |booster[2]:
      |0:[yardline_100<45] yes=1,no=2,missing=1
      |	1:leaf=1.0
      |	2:leaf=-0.2
      |booster[3]:
      |0:[yardline_100<70] yes=1,no=2,missing=1
      |	1:leaf=-0.4
      |	2:leaf=0.3
      |booster[4]:
      |0:leaf=-2.0
      |booster[5]:
      |0:[yardline_100<90] yes=1,no=2,missing=1
      |	1:leaf=-1.5
      |	2:leaf=0.5
      |booster[6]:
      |0:leaf=0.5
      |booster[7]:
      |0:[down1<0.5] yes=1,no=2,missing=1
      |	1:[ydstogo<5] yes=3,no=4,missing=3
      |		3:leaf=0.1
      |		4:leaf=-0.3
      |	2:leaf=0.3
      |booster[8]:
      |0:[down4<0.5] yes=1,no=2,missing=1
      |	1:leaf=-0.2
      |	2:leaf=0.4
      |booster[9]:
      |0:[ydstogo<3] yes=1,no=2,missing=1
      |	1:leaf=0.3
      |	2:leaf=0.0
      |booster[10]:
      |0:[down5<0.5] yes=1,no=2,missing=1
      |	1:leaf=0.0
      |	2:leaf=0.5
      |booster[11]:
      |0:leaf=0.0
      |booster[12]:
      |0:[yardline_100<95] yes=1,no=2,missing=1
      |	1:leaf=0.0
      |	2:leaf=0.3
      |booster[13]:
      |0:[down1<0.5] yes=1,no=2,missing=1
      |	1:leaf=0.1
      |	2:leaf=-0.1
      |""".stripMargin

  lazy val fixture: GbdtScorer.Model =
    GbdtScorer.parse(FixtureDump.linesIterator, FeatureNames, EpValues.length)

  /** Fixture-backed scorer — the default for demos/tests. */
  def fixtureScorer: DataFrame => DataFrame = scorer(fixture)
}
