"""FHIR eligibility-response extraction — the reference's signature
nested-JSON workload (SURVEY.md §2.9 N1–N12), schema-first.

The reference parses payer-variable FHIR bundles with recursive Python
over dicts (src/eligibility.py:409-610); the schema-first rewrite in
src/lch_eligibility.py:207-244 is the model here: declare the bundle
shape once (FIXTURES.md §2), ``from_json`` into a struct column, and
express every extractor as higher-order functions (filter / transform /
flatten) that run JVM-side inside codegen — no Python in the hot path.

Only ``find_keys`` (N7: search arbitrary unknown nesting for a key) is a
real scalar UDF — unknown-depth recursion has no closed-form Column DSL
equivalent. Everything else compiles to column expressions.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Declared bundle schema — the minimum shape that exercises every
# extractor (FIXTURES.md §2; full real example at the reference's
# src/eligibility_response.json). Payer-variable extras simply don't
# bind; from_json leaves absent fields null.
CODING = "struct<code: string, display: string>"
FHIR_RESPONSE_DDL = f"""
struct<
  status: string,
  message: string,
  nphies_response_time: double,
  response: struct<
    entry: array<struct<
      fullUrl: string,
      resource: struct<
        resourceType: string,
        outcome: string,
        disposition: string,
        error: array<struct<code: struct<coding: array<{CODING}>>>>,
        extension: array<struct<
          url: string,
          valueCodeableConcept: struct<coding: array<{CODING}>>
        >>,
        insurance: array<struct<
          inforce: boolean,
          item: array<struct<
            name: string,
            benefit: array<struct<
              allowedMoney: struct<value: double, currency: string>,
              type: struct<coding: array<{CODING}>>
            >>
          >>
        >>,
        costToBeneficiary: array<struct<
          type: struct<coding: array<{CODING}>>,
          valueMoney: struct<value: double>
        >>
      >
    >>
  >
>
"""


def parse_bundle(raw: Column) -> Column:
    """Raw JSON string → typed bundle struct (N1's parse step, minus the
    ``ast.literal_eval`` fallback which only exists because the reference
    stringifies Python dicts — the engine never does)."""
    return F.from_json(raw, FHIR_RESPONSE_DDL)


def entries(bundle: Column) -> Column:
    return bundle.getField("response").getField("entry")


def _first_nonnull_outcome(bundle: Column) -> Column:
    """First non-null ``resource.outcome`` across entries
    (eligibility.py:409-440 scans the entry list the same way)."""
    found = F.filter(entries(bundle), lambda e: e.resource.outcome.isNotNull())
    return F.try_element_at(found, F.lit(1)).getField("resource").getField("outcome")


def extract_outcome(bundle: Column) -> Column:
    """N4: complete→'Complete', error→'ERROR', anything else→'Null'."""
    raw = _first_nonnull_outcome(bundle)
    return (
        F.when(raw == "complete", F.lit("Complete"))
        .when(raw == "error", F.lit("ERROR"))
        .otherwise(F.lit("Null"))
    )


def _complete_cer_entries(bundle: Column) -> Column:
    return F.filter(
        entries(bundle),
        lambda e: (e.resource.resourceType == "CoverageEligibilityResponse")
        & (e.resource.outcome == "complete"),
    )


def extract_site_code(bundle: Column) -> Column:
    """N5: in complete CoverageEligibilityResponse entries, find the
    extension whose url mentions siteEligibility, take its first coding
    code (substring url match per the lch_eligibility.py:179-189 variant)."""
    exts = F.flatten(
        F.transform(_complete_cer_entries(bundle), lambda e: e.resource.extension)
    )
    matches = F.filter(exts, lambda x: x.url.contains("extension-siteEligibility"))
    codes = F.flatten(F.transform(matches, lambda x: x.valueCodeableConcept.coding))
    return F.try_element_at(codes, F.lit(1)).getField("code")


def extract_note(bundle: Column) -> Column:
    """N6: error outcome → '{code} {display}' of the first error coding;
    complete outcome → the CER's disposition; else null."""
    raw = _first_nonnull_outcome(bundle)
    err_entries = F.filter(
        entries(bundle), lambda e: F.size(F.coalesce(e.resource.error, F.array())) > 0
    )
    first_err = F.try_element_at(
        F.flatten(
            F.transform(
                err_entries,
                lambda e: F.flatten(F.transform(e.resource.error, lambda er: er.code.coding)),
            )
        ),
        F.lit(1),
    )
    disposition = F.try_element_at(_complete_cer_entries(bundle), F.lit(1)).getField("resource").getField(
        "disposition"
    )
    return (
        F.when(raw == "error", F.concat_ws(" ", first_err.getField("code"), first_err.getField("display")))
        .when(raw == "complete", disposition)
        .otherwise(F.lit(None).cast("string"))
    )


def _all_benefits(bundle: Column) -> Column:
    """benefit[] of insurance[0].item[] (the reference only ever reads the
    first insurance, eligibility.py:577-592)."""
    items = F.try_element_at(
        F.flatten(F.transform(entries(bundle), lambda e: F.coalesce(e.resource.insurance, F.array()))),
        F.lit(1),
    ).getField("item")
    return F.flatten(F.transform(F.coalesce(items, F.array()), lambda i: F.coalesce(i.benefit, F.array())))


def _benefit_value_by_code(bundle: Column, code: str) -> Column:
    """N12: first allowedMoney.value among benefits whose type coding
    carries ``code`` (the schema-first generic path)."""
    hits = F.filter(
        _all_benefits(bundle),
        lambda b: F.exists(
            F.coalesce(b.type.coding, F.array()), lambda c: c.code == code
        )
        & b.allowedMoney.isNotNull(),
    )
    return F.try_element_at(hits, F.lit(1)).getField("allowedMoney").getField("value")


def _bupa_approval_limit(bundle: Column) -> Column:
    """N10: item named 'Approval limit' → first benefit with allowedMoney."""
    items = F.try_element_at(
        F.flatten(F.transform(entries(bundle), lambda e: F.coalesce(e.resource.insurance, F.array()))),
        F.lit(1),
    ).getField("item")
    # .getField("name"): plain attribute access would hit Column.name()
    named = F.filter(
        F.coalesce(items, F.array()), lambda i: i.getField("name") == "Approval limit"
    )
    bens = F.flatten(F.transform(named, lambda i: F.coalesce(i.benefit, F.array())))
    with_money = F.filter(bens, lambda b: b.allowedMoney.isNotNull())
    return F.try_element_at(with_money, F.lit(1)).getField("allowedMoney").getField("value")


def _maxcopay_value(bundle: Column) -> Column:
    """N9/N12 fallback: costToBeneficiary[] whose type coding is
    maxcopay/copay-maximum → valueMoney.value."""
    ctb = F.flatten(
        F.transform(entries(bundle), lambda e: F.coalesce(e.resource.costToBeneficiary, F.array()))
    )
    hits = F.filter(
        ctb,
        lambda c: F.exists(
            F.coalesce(c.type.coding, F.array()),
            lambda k: k.code.isin("maxcopay", "copay-maximum"),
        ),
    )
    return F.try_element_at(hits, F.lit(1)).getField("valueMoney").getField("value")


def _first_full_url(bundle: Column) -> Column:
    return F.try_element_at(entries(bundle), F.lit(1)).getField("fullUrl")


def parse_limits(bundle: Column) -> Column:
    """N11: payer dispatch by fullUrl substring → struct(approval_limit,
    copay_maximum). Tawuniya reads typed benefits, Malath reads
    costToBeneficiary, Bupa reads the named item; unknown payers → nulls
    (eligibility.py:595-610)."""
    url = _first_full_url(bundle)
    null_d = F.lit(None).cast("double")
    return (
        F.when(
            url.contains("tawuniya.com.sa"),
            F.struct(
                _benefit_value_by_code(bundle, "approval-limit").alias("approval_limit"),
                _benefit_value_by_code(bundle, "copay-maximum").alias("copay_maximum"),
            ),
        )
        .when(
            url.contains("malath.com.sa"),
            F.struct(null_d.alias("approval_limit"), _maxcopay_value(bundle).alias("copay_maximum")),
        )
        .when(
            url.contains("bupa.com.sa"),
            F.struct(_bupa_approval_limit(bundle).alias("approval_limit"), null_d.alias("copay_maximum")),
        )
        .otherwise(F.struct(null_d.alias("approval_limit"), null_d.alias("copay_maximum")))
    )


# --------------------------------------------------------------------------
# N7 — the honest UDF: recursive key search over unknown nesting
# --------------------------------------------------------------------------


@F.udf(returnType=ArrayType(StringType()), useArrow=True)
def find_keys(raw, key):
    """Collect every value of ``key`` anywhere in the JSON document, in
    document order, each re-serialized as JSON (eligibility.py:547-559).
    Scalar UDF by necessity: unknown-depth recursion isn't expressible in
    the Column DSL. Not for hot paths — schema-first extractors above
    cover every known field.

    ``useArrow=True`` (r10, guide §4.3): the function body is unchanged
    (still called per row) but batches cross the JVM↔Python boundary as
    Arrow instead of pickled rows — the array<string> return type is
    exactly the nested shape the pickle path serializes worst. Return
    values are honestly typed (list[str] | [] | None), so the
    Arrow-vs-pickle coercion difference cannot bite."""
    if raw is None:
        return None
    try:
        doc = json.loads(raw)
    except (ValueError, TypeError):
        return []
    out: list[str] = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == key:
                    out.append(json.dumps(v, separators=(",", ":"), sort_keys=True))
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(doc)
    return out
