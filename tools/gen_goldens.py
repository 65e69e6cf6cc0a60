#!/usr/bin/env python3
"""Dev-only golden generator.

Runs the reference implementation (/root/reference, pure stdlib) over its
own committed raw fixtures and over function-level input tables, writing
expected outputs to src/main/resources/golden/. The Scala engine's tests
compare against these files.

ALWAYS regenerate with PYTHONHASHSEED=1 (canonical). The reference's
agency containment scan iterates a Python set, so multi-match inputs
(e.g. 'BRC RATINGS - S&P GLOBAL' containing both BRC and S&P) flip with
the hash seed; the engine's deterministic tie policy
(FicTransform.AgenciesByLength) is calibrated to the seed-1 outputs.
"""
import sys, os, json, glob, logging

# Hash randomization cannot be detected reliably after interpreter start,
# so enforce the canonical seed via the env var (a wrong-seed golden
# already slipped into a commit once — the seed-77 itau flip). An explicit
# check, not `assert`: asserts are stripped under -O/-OO.
if os.environ.get("PYTHONHASHSEED") != "1":
    sys.exit("regenerate with PYTHONHASHSEED=1 python3 tools/gen_goldens.py")

sys.path.insert(0, "/root/reference")
logging.disable(logging.CRITICAL)

from src.etl import transform as T  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "src/main/resources/golden")
os.makedirs(OUT, exist_ok=True)

# 1. Full-chain goldens: raw -> transform_fic_data (no fics.json present,
#    so the URL pass no-ops, matching our engine when given an empty lookup).
for f in sorted(glob.glob("/root/reference/data/json_raw_2025_07/*.json")):
    name = os.path.basename(f)
    with open(f) as fh:
        raw = json.load(fh)
    out = T.transform_fic_data(raw, name)
    with open(os.path.join(OUT, name.replace("_raw.json", "_expected.json")), "w") as fh:
        json.dump(out, fh, ensure_ascii=False, indent=2, sort_keys=True)

# 2. Spanish date parsing table (D1).
DATE_INPUTS = [
    "jul-25", "31-jul-25", "jul/25", "31/jul/2025", "ene-24", "diciembre-99",
    "31/07/2025", "2025-07-31", "31-07-2025", "07/31/2025", "31/07/25",
    "2025/07/31", "31-07-25", "15-agosto-2024", "agosto-2024", "AGO-25",
    "1-ene-2025", "29/02/2024", "29/02/2025", "30/02/2025", "13/13/2025",
    "00/01/2025", "1/1/2025", "", "n/a", "31 de julio de 2025", "2025-7-3",
    "sep/99", "sep-1989", "01/01/1989", "01/01/1990", "32-jul-25", "0-jul-25",
    "2025-02-30", "07/32/2025", "junio/2025", "6/15/2025", "15/6/25",
]
dates = {s: T._parse_fecha_robusta(s) for s in DATE_INPUTS}
json.dump(dates, open(os.path.join(OUT, "table_dates.json"), "w"),
          ensure_ascii=False, indent=2, sort_keys=True)

# 3. limpiar_valor table (M3).
MONEY_INPUTS = [0, 0.0, 1.0, 999999.99, 1000000.0, 1000000.01, 1000001.0,
                23232542280000.0, 5790737.44, 14343.651788, 1e9, 1e12,
                123456789.123, -5.5, 2_000_000.0, 1_000_000_000.5]
money = [[v, T.limpiar_valor(v)] for v in MONEY_INPUTS]
json.dump(money, open(os.path.join(OUT, "table_money.json"), "w"), indent=2)

# 4. LCS similarity table (ST5) — _calcular_similitud.
SIM_PAIRS = [
    ("fiducuenta", "fiducuenta"), ("fiducuenta", "fiducuentas"),
    ("sumar", "sumarpersonas"), ("altaliquidez", "ccaltaliquidez"),
    ("plazofijo", "metaplaneada"), ("moneymarket", "fondomoneymarketitau"),
    ("globalvista", "fondoglobalvista"), ("multiescala", "fondosmultiescala"),
    ("abc", "xyz"), ("", "x"), ("x", ""), ("abcd", "bcda"),
    ("renta", "rentabilidad"), ("fondo", "fond"),
]
from difflib import SequenceMatcher
sims = [[a, b, T._calcular_similitud(a, b), SequenceMatcher(None, a, b).ratio()] for a, b in SIM_PAIRS]
json.dump(sims, open(os.path.join(OUT, "table_similarity.json"), "w"), indent=2)

# 5. Agency fuzzy normalization (J2): upper/strip input ->
#    (normalized name or None).
AGENCY_INPUTS = [
    "FITCH", "Fitch Ratings", "fitch ratings colombia", "FICH RATINGS",
    "BRC", "BRC Investor Services", "BRC INVESTOR SERVICES S.A. SCV",
    "Standard & Poor's", "S&P", "S&P GLOBAL", "MOODYS", "MOODY'S",
    "moody's investors service", "VALORA", "N/A", "", "DESCONOCIDA",
    "value & risk rating", "DBRS", "dbrs morningstar",
]
ag = {}
for s in AGENCY_INPUTS:
    ent = s.upper().strip()
    ag[s] = T._buscar_coincidencia_difusa(ent, T.ENTIDADES_CALIFICADORAS_RECONOCIDAS)
json.dump(ag, open(os.path.join(OUT, "table_agency.json"), "w"),
          ensure_ascii=False, indent=2, sort_keys=True)

# 6. Bank name normalization + flexible bank key matching (J1 bank side).
FICS_KEYS = ["bancolombia", "bancoDeBogota", "bancoDeOccidenteFiduoccidente",
             "credicorpCapital", "davivienda", "itau", "progresion",
             "bbva", "scotiabankColpatria"]
BANK_INPUTS = ["bancolombia", "bancodebogota", "bancoDeOccidenteFiduoccidente",
               "credicorpcapital", "davivienda", "itau", "progresion",
               "bancofinandina", "bancoreservas", "gnbsudameris", "banco-agrario",
               "itaucolombia", "davi", "xyzbank"]
bank = {}
for s in BANK_INPUTS:
    norm = T._normalizar_nombre_banco(s.lower())
    match = T._buscar_banco_coincidente(norm, FICS_KEYS)
    bank[s] = [norm, match]
json.dump(bank, open(os.path.join(OUT, "table_bank.json"), "w"),
          ensure_ascii=False, indent=2, sort_keys=True)

# 7. Fund-name aggressive normalization + URL pick (J1 fund side) against a
#    synthetic per-bank fund->url dict.
FUNDS = {
    "Fiducuenta": "https://example.com/fiducuenta",
    "Fondo De Inversion Colectiva Abierto Sumar": "https://example.com/sumar",
    "FIC Alta Liquidez": "https://example.com/alta",
    "Money Market": "https://example.com/mm",
    "Renta Fija Plazo": "https://example.com/rfp",
}
FUND_INPUTS = ["fiducuenta", "sumar", "altaLiquidez", "moneyMarket",
               "plazoFijo", "globalVista", "rentaPlazo", "fiduCuenta"]
fund = {}
for q in FUND_INPUTS:
    qn = T._normalizar_nombre_fic_agresivo(q)
    best_url, best_score = None, 0.0
    for k, url in FUNDS.items():
        kn = T._normalizar_nombre_fic_agresivo(k)
        score = T._calcular_similitud(qn, kn)
        if kn == qn:
            best_url, best_score = url, score
            break
        elif score > best_score and score > 0.7:
            best_url, best_score = url, score
    fund[q] = [qn, best_url, best_score]
json.dump(fund, open(os.path.join(OUT, "table_fund.json"), "w"),
          ensure_ascii=False, indent=2, sort_keys=True)

print("goldens written to", os.path.abspath(OUT))

# 8. Gate docs: full-chain expected scalars for the driver's oracle gate.
#    Inputs live in gate_docs.json (single source of truth for Scala+SQL).
import copy
gate_docs = json.load(open(os.path.join(OUT, "gate-docs.json")))
gate_exp = {}
for doc_id in sorted(gate_docs):
    out = T.transform_fic_data(copy.deepcopy(gate_docs[doc_id]), f"{doc_id}_x_raw.json")
    def g(*path):
        cur = out
        for p in path:
            if isinstance(p, int):
                if not isinstance(cur, list) or p >= len(cur): return None
                cur = cur[p]
            else:
                if not isinstance(cur, dict) or p not in cur: return None
                cur = cur[p]
        return cur
    gate_exp[doc_id] = {
        "fecha_corte": g("fic", "fecha_corte"),
        "tipo": g("fic", "tipo"),
        "fecha_inicio": g("caracteristicas", "fecha_inicio_operaciones"),
        "valor": g("caracteristicas", "valor"),
        "unidades": g("caracteristicas", "no_unidades_en_circulacion"),
        "entidad": g("calificacion", "entidad_calificadora"),
        "ent_norm": g("calificacion", "entidad_calificadora_normalizada"),
        "fecha_calif": g("calificacion", "fecha_ultima_calificacion"),
        "plazo0": g("plazo_duracion", 0, "participacion"),
        "plazo1": g("plazo_duracion", 1, "participacion"),
        "activo0": g("composicion_portafolio", "por_activo", 0, "participacion"),
        "inv0": g("principales_inversiones", 0, "participacion"),
        "rent_6m": g("rentabilidad_volatilidad", 0, "rentabilidad_historica_ea", "ultimos_6_meses"),
        "rent_ac": g("rentabilidad_volatilidad", 0, "rentabilidad_historica_ea", "anio_corrido"),
        "vol_1a": g("rentabilidad_volatilidad", 0, "volatilidad_historica", "ultimo_anio"),
        "n_plazos": len(g("plazo_duracion") or []),
    }
json.dump(gate_exp, open(os.path.join(OUT, "gate-expected.json"), "w"),
          ensure_ascii=False, indent=2, sort_keys=True)
