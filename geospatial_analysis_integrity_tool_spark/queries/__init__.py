"""Query registry: each submodule exports QUERIES (name -> callable(spark, sf_dir)
-> DataFrame) and ORACLES (name -> DuckDB SQL text).  __spark_entry__.py at the
repo root aggregates them for the driver's correctness gate."""

from __future__ import annotations


def all_queries():
    from . import (
        attrchecks,
        attrisf,
        checks2,
        checks3,
        conditionspipe,
        coverage2,
        coverageq,
        demchecks2,
        edgematch3,
        edgematchq,
        embeddings,
        lavariants,
        endptq,
        geometry,
        metadataq,
        mgcpq,
        misc,
        morechecks,
        negationq,
        networksq,
        nonsql,
        overlay,
        overshootq,
        packagingq,
        raster2,
        rasterhydro,
        rastermask,
        relational,
        scalarq,
        sensq,
        shpq,
        specq,
        stragglerq,
        streamq,
        textops,
        uomq,
        variantq,
        vgeomq,
    )

    q: dict = {}
    o: dict = {}
    for mod in (
        relational,
        geometry,
        textops,
        embeddings,
        attrchecks,
        attrisf,
        conditionspipe,
        overlay,
        vgeomq,
        raster2,
        rastermask,
        rasterhydro,
        demchecks2,
        coverage2,
        coverageq,
        checks2,
        checks3,
        edgematchq,
        edgematch3,
        lavariants,
        endptq,
        variantq,
        networksq,
        negationq,
        morechecks,
        metadataq,
        mgcpq,
        packagingq,
        misc,
        uomq,
        specq,
        stragglerq,
        streamq,
        shpq,
        scalarq,
        sensq,
        overshootq,
        nonsql,
    ):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    return q, o
