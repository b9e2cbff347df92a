
ž
finnhub.proto"Œ
FinnhubTrade
symbol (	Rs
price (Rp
	tradeTime (Rt
volume (Rv
tradeConditions (	Rc:Šµfinnhub.trades