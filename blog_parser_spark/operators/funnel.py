"""Ordered-sequence (funnel) matching over the event log — the
MATCH_RECOGNIZE-shaped analytics op every log pipeline ships: for each
user, how far through an ordered step sequence (signup -> view -> click
-> purchase) did they progress, where each step must occur STRICTLY
after the chosen occurrence of the previous step.

Spark formulation (one shuffle, zero Python):
  groupBy(user) . collect_list(struct(ts_us, event_type)) . sort_array
  -> F.aggregate fold advancing a (stage, t_us) state struct.
Processing events in ascending time order and advancing greedily on the
earliest qualifying event is optimal for funnel reachability (an earlier
step-k time only weakens the constraint on step k+1), so the fold is
semantically identical to the chained-min formulation the SQL oracle
uses — and it costs ONE hash shuffle on user_id instead of one
join+aggregate per step. Per-user state is the user's own event list
(the standard sessionization memory shape); a pathological power-user
key would need the same salting treatment as agg_salted.

Timestamps are compared at microsecond precision (unix_micros /
epoch_us) because the fixture timestamps carry microseconds and a
seconds cast would round differently across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

FUNNEL_STEPS: tuple[str, ...] = ("signup", "view", "click", "purchase")


def funnel_stages(events: DataFrame,
                  steps: tuple[str, ...] = FUNNEL_STEPS) -> DataFrame:
    """Per-user funnel progression: (user_id, funnel_stage, funnel_ts_us).

    funnel_stage in [0, len(steps)]; funnel_ts_us is the time the last
    reached step was entered (NULL when stage = 0).
    """
    n = len(steps)
    ev = (events.filter(F.col("event_type").isin(list(steps)))
          .select("user_id",
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                  "event_type"))
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts_us", "event_type"))).alias("evs"))

    step_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(F.lit(0).cast("int").alias("stage"),
                    F.lit(-1).cast("long").alias("t_us"))

    def _advance(acc: Column, e: Column) -> Column:
        # least() keeps element_at in bounds once the final stage is
        # reached (ANSI mode errors on out-of-range indices); the
        # acc.stage < n conjunct still blocks any further advancement.
        nxt = F.element_at(step_arr, F.least(acc["stage"] + 1, F.lit(n)))
        adv = ((acc["stage"] < n) & (e["ts_us"] > acc["t_us"])
               & (e["event_type"] == nxt))
        return (F.when(adv, F.struct((acc["stage"] + 1).alias("stage"),
                                     e["ts_us"].alias("t_us")))
                .otherwise(acc))

    res = F.aggregate("evs", init, _advance)
    return per_user.select(
        "user_id",
        res["stage"].alias("funnel_stage"),
        F.when(res["stage"] > 0, res["t_us"])
         .otherwise(F.lit(None).cast("long")).alias("funnel_ts_us"))
