package graft.tools

/** Regenerate the checked-in language-ID profile table
  * (src/main/resources/graft/lang_profiles.tsv): a 42-language
  * character-trigram multinomial Naive Bayes, trained here from the
  * embedded public-knowledge seed paragraphs and emitted as INTEGER
  * log-probability codes in the same 32-per-octave family as
  * [[graft.ops.TextOps.bigramSurprisal]]/`nbQualityFilter` - so the
  * scorer replays engine-exactly in the DuckDB oracle (a float-log NB
  * cannot).
  *
  * Training: per language, normalize the seed exactly like the scorer
  * ([[graft.ops.TextOps]]' langNormalize: lowercase, non-letters to
  * space, collapse runs, trim), count all character n-grams of sizes
  * 1..3 (mixed sizes, the langid.py recipe: unigrams carry
  * script/letter-frequency evidence - essential for CJK, where a short
  * seed covers few exact trigrams - bigrams/trigrams the orthography),
  * keep the top `VOCAB_PER_SIZE` per language PER SIZE (a plain
  * frequency cut would drown trigrams under unigram counts), union
  * into the global vocabulary, then for EVERY (vocab gram, language)
  * pair emit the add-one-smoothed code difference
  *
  *   w(g, l) = ilog32(256 * (c(g,l) + 1)) - ilog32(256 * (N_l,s + V_s))
  *
  * where s = |g|, N_l,s = language l's total size-s gram occurrences
  * and V_s the size-s vocabulary count: each gram SIZE is its own
  * multinomial event space (the model is a product of three NBs, not
  * one distribution polluted across sizes). Grams outside the
  * vocabulary score 0 for every language - a constant argmax shift, so
  * dropping them is lossless for classification.
  *
  * Output TSV: header `#langs<TAB>ar,cs,...`; then one line per vocab
  * gram: `gram<TAB>w1,w2,...` in header language order. Grams never
  * contain TAB (normalization maps tabs to spaces), so the format is
  * unambiguous.
  *
  * Usage: runMain graft.tools.LangProfilesTool <outFile>
  */
object LangProfilesTool {

  // 300 (was 200 at 26 languages): breadth needs coverage - with 42
  // languages the shared vocabulary dilutes, and near neighbors
  // (es/ca/fr, cs/sk, hr/sl) need the deeper per-language gram lists
  // to keep short held-out sentences separating
  val VOCAB_PER_SIZE = 300
  val GRAM_SIZES: Seq[Int] = Seq(1, 2, 3)

  /** Seed paragraphs - plain contemporary prose written for this tool
    * (public knowledge; no corpus text). Keys are ISO 639-1 codes;
    * ordering in the emitted table is ALPHABETICAL by code (this is
    * also the scorer's deterministic tie-break order).
    */
  val seeds: Map[String, String] = Map(
    "ar" -> ("يقفز الثعلب البني السريع فوق الكلب الكسول. كانت أفضل الأوقات وكان الناس يقرؤون كتبا كثيرة عن التاريخ والعلوم. " +
      "يلعب الأطفال في الحديقة بينما يراقبهم آباؤهم باهتمام كبير. يجب أن نحاول دائما تعلم شيء جديد كل يوم لأن المعرفة هي أهم ما نملك. " +
      "في الصباح يذهب الكثير من الناس إلى العمل بالقطار ويقرؤون الأخبار في الطريق. " + 
      "في المساء مشينا على طول النهر وتحدثنا عن خططنا للمستقبل. كان الجو باردا لكن السماء كانت صافية ومليئة بالنجوم. تعمل أختي في متجر صغير قرب المحطة وهي تحب عملها كثيرا."),
    "cs" -> ("rychlá hnědá liška skáče přes líného psa. byly to nejlepší časy a lidé četli mnoho knih o historii a vědě. " +
      "děti si často hrají v parku zatímco jejich rodiče je sledují s velkou pozorností. " +
      "měli bychom se vždy snažit naučit něco nového každý den protože vědění je to nejdůležitější co máme. " +
      "ráno jezdí mnoho lidí do práce vlakem a cestou si čtou zprávy. " + 
      "včera večer jsme se procházeli podél řeky a mluvili o našich plánech do budoucna. bylo chladno ale obloha byla jasná a plná hvězd. moje sestra pracuje v malém obchodě blízko nádraží a její práce ji moc baví. " +
      "každé ráno piju kávu a čtu si noviny u okna. náš děda vypráví dlouhé příběhy o svém mládí a všichni ho rádi posloucháme. v zimě padá sníh a děti staví sněhuláky na zahradě u babičky."),
    "da" -> ("den hurtige brune ræv hopper over den dovne hund. det var den bedste af tider og folk læste mange bøger om historie og videnskab. " +
      "børnene leger ofte i parken mens deres forældre ser på dem med stor opmærksomhed. " +
      "vi bør altid forsøge at lære noget nyt hver dag fordi viden er det vigtigste vi har. " +
      "om morgenen tager mange mennesker toget på arbejde og læser nyhederne undervejs. " + 
      "i går aftes gik vi langs floden og talte om vores planer for fremtiden. det var koldt men himlen var klar og fuld af stjerner. min søster arbejder i en lille butik tæt ved stationen og hun kan rigtig godt lide sit arbejde."),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund. es war die beste aller zeiten und die menschen lasen viele bücher über geschichte und wissenschaft. " +
      "kinder spielen oft im park während ihre eltern ihnen mit großer aufmerksamkeit zuschauen. " +
      "wir sollten jeden tag etwas neues lernen denn wissen ist das wichtigste was wir haben. " +
      "am morgen fahren viele leute mit dem zug zur arbeit und lesen unterwegs die nachrichten. " + 
      "gestern abend sind wir am fluss entlang spaziert und haben über unsere pläne für die zukunft gesprochen. das wetter war kalt aber der himmel war klar und voller sterne. meine schwester arbeitet in einem kleinen laden in der nähe des bahnhofs und ihre arbeit gefällt ihr sehr."),
    "el" -> ("η γρήγορη καφέ αλεπού πηδά πάνω από τον τεμπέλη σκύλο. ήταν οι καλύτερες εποχές και οι άνθρωποι διάβαζαν πολλά βιβλία για την ιστορία και την επιστήμη. " +
      "τα παιδιά παίζουν συχνά στο πάρκο ενώ οι γονείς τους τα παρακολουθούν με μεγάλη προσοχή. " +
      "πρέπει πάντα να προσπαθούμε να μαθαίνουμε κάτι καινούριο κάθε μέρα γιατί η γνώση είναι το πιο σημαντικό πράγμα που έχουμε. " + 
      "χθες το βράδυ περπατήσαμε κατά μήκος του ποταμού και μιλήσαμε για τα σχέδιά μας για το μέλλον. έκανε κρύο αλλά ο ουρανός ήταν καθαρός και γεμάτος αστέρια. η αδερφή μου δουλεύει σε ένα μικρό μαγαζί κοντά στον σταθμό και της αρέσει πολύ η δουλειά της."),
    "en" -> ("the quick brown fox jumps over the lazy dog. it was the best of times and people were reading many books about history and science. " +
      "children often play in the park while their parents watch them with great attention. " +
      "we should always try to learn something new every day because knowledge is the most important thing we have. " +
      "in the morning many people take the train to work and read the news on the way. " + 
      "yesterday evening we walked along the river and talked about our plans for the future. the weather was cold but the sky was clear and full of stars. my sister works in a small shop near the station and she likes her job very much."),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso. era la mejor de las épocas y la gente leía muchos libros sobre historia y ciencia. " +
      "los niños juegan en el parque mientras sus padres los miran con mucha atención. " +
      "siempre debemos intentar aprender algo nuevo cada día porque el conocimiento es lo más importante que tenemos. " +
      "por la mañana mucha gente toma el tren para ir al trabajo y lee las noticias por el camino. " + 
      "ayer por la tarde caminamos junto al río y hablamos de nuestros planes para el futuro. hacía frío pero el cielo estaba despejado y lleno de estrellas. mi hermana trabaja en una tienda pequeña cerca de la estación y le gusta mucho su trabajo. " +
      "muchos señores mayores pasean despacio por las calles de la ciudad antigua cada domingo. cuando llega el verano vamos a la playa con los abuelos y comemos pescado fresco mientras escuchamos canciones españolas."),
    "fi" -> ("nopea ruskea kettu hyppää laiskan koiran yli. se oli aikojen paras ja ihmiset lukivat monia kirjoja historiasta ja tieteestä. " +
      "lapset leikkivät usein puistossa kun heidän vanhempansa katsovat heitä suurella tarkkaavaisuudella. " +
      "meidän pitäisi aina yrittää oppia jotain uutta joka päivä koska tieto on tärkein asia joka meillä on. " +
      "aamulla monet ihmiset menevät junalla töihin ja lukevat uutisia matkalla. " + 
      "eilen illalla kävelimme joen vartta pitkin ja puhuimme tulevaisuuden suunnitelmistamme. oli kylmä mutta taivas oli kirkas ja täynnä tähtiä. siskoni työskentelee pienessä kaupassa aseman lähellä ja hän pitää työstään todella paljon."),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux. c'était la meilleure des époques et les gens lisaient beaucoup de livres sur l'histoire et la science. " +
      "les enfants jouent souvent dans le parc pendant que leurs parents les regardent avec une grande attention. " +
      "nous devrions toujours essayer d'apprendre quelque chose de nouveau chaque jour parce que la connaissance est la chose la plus importante que nous ayons. " +
      "le matin beaucoup de gens prennent le train pour aller au travail et lisent les nouvelles en chemin. " + 
      "hier soir nous avons marché le long de la rivière et parlé de nos projets pour l'avenir. il faisait froid mais le ciel était clair et plein d'étoiles. ma sœur travaille dans un petit magasin près de la gare et elle aime beaucoup son travail."),
    "hi" -> ("तेज भूरी लोमड़ी आलसी कुत्ते के ऊपर से कूदती है। यह सबसे अच्छा समय था और लोग इतिहास और विज्ञान के बारे में कई किताबें पढ़ते थे। " +
      "बच्चे अक्सर पार्क में खेलते हैं जबकि उनके माता पिता उन्हें बड़े ध्यान से देखते हैं। " +
      "हमें हर दिन कुछ नया सीखने की कोशिश करनी चाहिए क्योंकि ज्ञान सबसे महत्वपूर्ण चीज है। " +
      "सुबह बहुत से लोग ट्रेन से काम पर जाते हैं और रास्ते में समाचार पढ़ते हैं। " + 
      "कल शाम हम नदी के किनारे टहले और भविष्य की योजनाओं के बारे में बात की। मौसम ठंडा था लेकिन आसमान साफ और तारों से भरा था। मेरी बहन स्टेशन के पास एक छोटी दुकान में काम करती है और उसे अपना काम बहुत पसंद है।"),
    "hu" -> ("a gyors barna róka átugrik a lusta kutya felett. ez volt a legjobb idő és az emberek sok könyvet olvastak a történelemről és a tudományról. " +
      "a gyerekek gyakran játszanak a parkban míg a szüleik nagy figyelemmel nézik őket. " +
      "minden nap meg kellene próbálnunk valami újat tanulni mert a tudás a legfontosabb dolog amink van. " +
      "reggelente sokan vonattal mennek dolgozni és útközben híreket olvasnak. " + 
      "tegnap este a folyó mentén sétáltunk és a jövőbeli terveinkről beszélgettünk. hideg volt de az ég tiszta volt és tele csillagokkal. a nővérem egy kis boltban dolgozik az állomás közelében és nagyon szereti a munkáját."),
    "id" -> ("rubah coklat yang cepat melompati anjing yang malas. itu adalah masa terbaik dan orang orang membaca banyak buku tentang sejarah dan ilmu pengetahuan. " +
      "anak anak sering bermain di taman sementara orang tua mereka mengawasi dengan perhatian besar. " +
      "kita harus selalu berusaha mempelajari sesuatu yang baru setiap hari karena pengetahuan adalah hal terpenting yang kita miliki. " +
      "di pagi hari banyak orang naik kereta ke tempat kerja dan membaca berita di perjalanan. " + 
      "tadi malam kami berjalan jalan di sepanjang sungai dan berbicara tentang rencana masa depan kami. cuacanya dingin tetapi langit cerah dan penuh bintang. kakak perempuan saya bekerja di sebuah toko kecil dekat stasiun dan dia sangat menyukai pekerjaannya."),
    "it" -> ("la rapida volpe marrone salta sopra il cane pigro. era il migliore dei tempi e la gente leggeva molti libri di storia e di scienza. " +
      "i bambini giocano spesso nel parco mentre i loro genitori li guardano con grande attenzione. " +
      "dovremmo sempre cercare di imparare qualcosa di nuovo ogni giorno perché la conoscenza è la cosa più importante che abbiamo. " +
      "al mattino molte persone prendono il treno per andare al lavoro e leggono le notizie lungo la strada. " + 
      "ieri sera abbiamo camminato lungo il fiume e abbiamo parlato dei nostri progetti per il futuro. faceva freddo ma il cielo era limpido e pieno di stelle. mia sorella lavora in un piccolo negozio vicino alla stazione e il suo lavoro le piace molto."),
    "ja" -> ("素早い茶色の狐は怠け者の犬を飛び越えます。それは最良の時代であり人々は歴史や科学についての多くの本を読んでいました。" +
      "子供たちはよく公園で遊びその両親は大きな注意を払って彼らを見守っています。" +
      "知識は私たちが持つ最も大切なものなので毎日新しいことを学ぶように努めるべきです。" +
      "朝には多くの人が電車で仕事に行き道中でニュースを読みます。 " + 
      "昨日の夕方私たちは川沿いを歩きながら将来の計画について話しました。寒かったですが空は澄んでいて星がいっぱいでした。私の姉は駅の近くの小さな店で働いていて自分の仕事がとても好きです。"),
    "ko" -> ("빠른 갈색 여우가 게으른 개를 뛰어넘습니다. 그것은 최고의 시절이었고 사람들은 역사와 과학에 관한 많은 책을 읽었습니다. " +
      "아이들은 자주 공원에서 놀고 그들의 부모는 큰 관심을 가지고 그들을 지켜봅니다. " +
      "지식은 우리가 가진 가장 중요한 것이므로 매일 새로운 것을 배우려고 노력해야 합니다. " +
      "아침에는 많은 사람들이 기차를 타고 출근하며 가는 길에 뉴스를 읽습니다. " + 
      "어제 저녁 우리는 강을 따라 걸으며 미래의 계획에 대해 이야기했습니다. 날씨는 추웠지만 하늘은 맑고 별이 가득했습니다. 제 언니는 역 근처의 작은 가게에서 일하는데 자기 일을 아주 좋아합니다."),
    "nl" -> ("de snelle bruine vos springt over de luie hond. het was de beste der tijden en de mensen lazen veel boeken over geschiedenis en wetenschap. " +
      "kinderen spelen vaak in het park terwijl hun ouders met veel aandacht naar hen kijken. " +
      "we zouden elke dag iets nieuws moeten leren want kennis is het belangrijkste wat we hebben. " +
      "s ochtends nemen veel mensen de trein naar het werk en lezen onderweg het nieuws. " + 
      "gisteravond liepen we langs de rivier en praatten we over onze plannen voor de toekomst. het was koud maar de lucht was helder en vol sterren. mijn zus werkt in een kleine winkel bij het station en ze vindt haar werk erg leuk."),
    "no" -> ("den raske brune reven hopper over den late hunden. det var den beste av tider og folk leste mange bøker om historie og vitenskap. " +
      "barna leker ofte i parken mens foreldrene deres ser på dem med stor oppmerksomhet. " +
      "vi bør alltid prøve å lære noe nytt hver dag fordi kunnskap er det viktigste vi har. " +
      "om morgenen tar mange mennesker toget til jobben og leser nyhetene på veien. " + 
      "i går kveld gikk vi langs elven og snakket om planene våre for fremtiden. det var kaldt men himmelen var klar og full av stjerner. søsteren min jobber i en liten butikk i nærheten av stasjonen og hun liker jobben sin veldig godt."),
    "pl" -> ("szybki brązowy lis skacze nad leniwym psem. to były najlepsze czasy a ludzie czytali wiele książek o historii i nauce. " +
      "dzieci często bawią się w parku podczas gdy ich rodzice obserwują je z wielką uwagą. " +
      "powinniśmy zawsze starać się nauczyć czegoś nowego każdego dnia ponieważ wiedza jest najważniejszą rzeczą jaką mamy. " +
      "rano wiele osób jedzie pociągiem do pracy i po drodze czyta wiadomości. " + 
      "wczoraj wieczorem spacerowaliśmy wzdłuż rzeki i rozmawialiśmy o naszych planach na przyszłość. było zimno ale niebo było czyste i pełne gwiazd. moja siostra pracuje w małym sklepie niedaleko dworca i bardzo lubi swoją pracę."),
    "pt" -> ("a rápida raposa marrom salta sobre o cão preguiçoso. era o melhor dos tempos e as pessoas liam muitos livros sobre história e ciência. " +
      "as crianças brincam no parque enquanto os seus pais as observam com muita atenção. " +
      "devemos sempre tentar aprender algo novo todos os dias porque o conhecimento é a coisa mais importante que temos. " +
      "de manhã muitas pessoas apanham o comboio para o trabalho e leem as notícias pelo caminho. " + 
      "ontem à noite caminhámos ao longo do rio e falámos sobre os nossos planos para o futuro. estava frio mas o céu estava limpo e cheio de estrelas. a minha irmã trabalha numa loja pequena perto da estação e gosta muito do seu trabalho."),
    "ro" -> ("vulpea maro rapidă sare peste câinele leneș. au fost cele mai bune vremuri iar oamenii citeau multe cărți despre istorie și știință. " +
      "copiii se joacă adesea în parc în timp ce părinții lor îi privesc cu mare atenție. " +
      "ar trebui să încercăm mereu să învățăm ceva nou în fiecare zi pentru că cunoașterea este cel mai important lucru pe care îl avem. " +
      "dimineața mulți oameni iau trenul spre serviciu și citesc știrile pe drum. " + 
      "aseară ne am plimbat de a lungul râului și am vorbit despre planurile noastre de viitor. era frig dar cerul era senin și plin de stele. sora mea lucrează într un magazin mic lângă gară și îi place foarte mult munca ei."),
    "ru" -> ("быстрая коричневая лиса прыгает через ленивую собаку. это было лучшее из времён и люди читали много книг об истории и науке. " +
      "дети часто играют в парке пока их родители смотрят на них с большим вниманием. " +
      "мы должны каждый день стараться узнавать что то новое потому что знание это самое важное что у нас есть. " +
      "утром многие люди едут на работу на поезде и по дороге читают новости. " + 
      "поздно вечером мы гуляли вдоль реки и говорили о наших планах на будущее. было холодно но небо было ясным и полным звёзд. моя сестра работает в маленьком магазине недалеко от вокзала и ей очень нравится её работа."),
    "sv" -> ("den snabba bruna räven hoppar över den lata hunden. det var den bästa av tider och människorna läste många böcker om historia och vetenskap. " +
      "barnen leker ofta i parken medan deras föräldrar tittar på dem med stor uppmärksamhet. " +
      "vi borde alltid försöka lära oss något nytt varje dag eftersom kunskap är det viktigaste vi har. " +
      "på morgonen tar många människor tåget till arbetet och läser nyheterna på vägen. " + 
      "igår kväll promenerade vi längs floden och pratade om våra planer för framtiden. det var kallt men himlen var klar och full av stjärnor. min syster arbetar i en liten affär nära stationen och hon tycker mycket om sitt jobb."),
    "tr" -> ("hızlı kahverengi tilki tembel köpeğin üzerinden atlar. zamanların en iyisiydi ve insanlar tarih ve bilim hakkında birçok kitap okuyordu. " +
      "çocuklar sık sık parkta oynar ve anneleri babaları onları büyük bir dikkatle izler. " +
      "her gün yeni bir şey öğrenmeye çalışmalıyız çünkü bilgi sahip olduğumuz en önemli şeydir. " +
      "sabahları birçok insan işe trenle gider ve yolda haberleri okur. " + 
      "dün akşam nehir boyunca yürüdük ve gelecek planlarımız hakkında konuştuk. hava soğuktu ama gökyüzü açıktı ve yıldızlarla doluydu. kız kardeşim istasyonun yakınındaki küçük bir dükkanda çalışıyor ve işini çok seviyor."),
    "uk" -> ("швидка коричнева лисиця стрибає через ледачого собаку. це були найкращі часи і люди читали багато книжок про історію та науку. " +
      "діти часто граються в парку поки їхні батьки дивляться на них з великою увагою. " +
      "ми повинні щодня намагатися дізнаватися щось нове бо знання це найважливіше що в нас є. " +
      "вранці багато людей їдуть на роботу потягом і дорогою читають новини. " + 
      "учора ввечері ми гуляли вздовж річки й говорили про наші плани на майбутнє. було холодно але небо було ясним і повним зірок. моя сестра працює в маленькій крамниці біля вокзалу і їй дуже подобається її робота."),
    "vi" -> ("con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng. đó là thời kỳ tốt đẹp nhất và mọi người đã đọc nhiều sách về lịch sử và khoa học. " +
      "trẻ em thường chơi trong công viên trong khi cha mẹ chúng quan sát chúng với sự chú ý lớn. " +
      "chúng ta nên cố gắng học điều gì đó mới mỗi ngày vì kiến thức là điều quan trọng nhất mà chúng ta có. " +
      "buổi sáng nhiều người đi tàu đến chỗ làm và đọc tin tức trên đường. " + 
      "tối qua chúng tôi đi dạo dọc bờ sông và nói về những kế hoạch tương lai của mình. trời lạnh nhưng bầu trời trong xanh và đầy sao. chị gái tôi làm việc trong một cửa hàng nhỏ gần nhà ga và chị ấy rất thích công việc của mình."),
    "zh" -> ("敏捷的棕色狐狸跳过了懒狗。那是最好的时代人们阅读了许多关于历史和科学的书籍。" +
      "孩子们经常在公园里玩耍而他们的父母则非常专注地看着他们。" +
      "我们应该每天努力学习新的东西因为知识是我们拥有的最重要的东西。" +
      "早上很多人坐火车去上班并在路上看新闻。 " +
      "昨天晚上我们沿着河边散步谈论我们未来的计划。天气很冷但是天空晴朗满天星星。我的姐姐在车站附近的一家小商店工作她非常喜欢自己的工作。"),
    // --- round-12 breadth: 16 further languages, same prose template ---
    "bg" -> ("бързата кафява лисица прескача мързеливото куче. беше най-доброто време и хората четяха много книги за история и наука. " +
      "децата често играят в парка докато родителите им ги наблюдават с голямо внимание. " +
      "трябва винаги да се опитваме да научим нещо ново всеки ден защото знанието е най-важното което имаме. " +
      "сутрин много хора пътуват с влака до работа и четат новините по пътя. " +
      "снощи се разхождахме покрай реката и говорихме за плановете си за бъдещето. времето беше студено но небето беше ясно и пълно със звезди. сестра ми работи в малък магазин близо до гарата и много харесва работата си."),
    "bn" -> ("দ্রুত বাদামী শিয়াল অলস কুকুরের উপর দিয়ে লাফ দেয়। এটি ছিল সেরা সময় এবং মানুষ ইতিহাস ও বিজ্ঞান সম্পর্কে অনেক বই পড়ত। " +
      "শিশুরা প্রায়ই পার্কে খেলা করে এবং তাদের বাবা মা তাদের মনোযোগ দিয়ে দেখেন। " +
      "আমাদের প্রতিদিন নতুন কিছু শেখার চেষ্টা করা উচিত কারণ জ্ঞান আমাদের সবচেয়ে গুরুত্বপূর্ণ সম্পদ। " +
      "সকালে অনেক মানুষ ট্রেনে করে কাজে যায় এবং পথে খবর পড়ে। " +
      "গতকাল সন্ধ্যায় আমরা নদীর ধারে হাঁটলাম এবং ভবিষ্যতের পরিকল্পনা নিয়ে কথা বললাম। আবহাওয়া ঠান্ডা ছিল কিন্তু আকাশ পরিষ্কার এবং তারায় ভরা ছিল। আমার বোন স্টেশনের কাছে একটি ছোট দোকানে কাজ করে এবং সে তার কাজ খুব পছন্দ করে।"),
    "ca" -> ("la ràpida guineu marró salta per sobre del gos mandrós. era el millor dels temps i la gent llegia molts llibres sobre història i ciència. " +
      "els nens juguen sovint al parc mentre els seus pares els miren amb molta atenció. " +
      "hauríem d'intentar aprendre alguna cosa nova cada dia perquè el coneixement és el més important que tenim. " +
      "al matí molta gent agafa el tren per anar a la feina i llegeix les notícies pel camí. " +
      "ahir al vespre vam passejar al llarg del riu i vam parlar dels nostres plans per al futur. feia fred però el cel era clar i ple d'estrelles. la meva germana treballa en una botiga petita a prop de l'estació i li agrada molt la seva feina."),
    "et" -> ("kiire pruun rebane hüppab üle laisa koera. see oli parim aeg ja inimesed lugesid palju raamatuid ajaloost ja teadusest. " +
      "lapsed mängivad sageli pargis samal ajal kui nende vanemad neid suure tähelepanuga jälgivad. " +
      "me peaksime alati püüdma iga päev midagi uut õppida sest teadmised on kõige tähtsam mis meil on. " +
      "hommikul sõidavad paljud inimesed rongiga tööle ja loevad teel uudiseid. " +
      "eile õhtul jalutasime mööda jõge ja rääkisime oma tulevikuplaanidest. ilm oli külm aga taevas oli selge ja tähti täis. minu õde töötab väikeses poes jaama lähedal ja talle meeldib tema töö väga."),
    "eu" -> ("azeri marroi azkarrak txakur alferraren gainetik salto egiten du. garai onenak ziren eta jendeak liburu asko irakurtzen zituen historiari eta zientziari buruz. " +
      "haurrek askotan parkean jolasten dute gurasoek arreta handiz begiratzen dieten bitartean. " +
      "egunero zerbait berria ikasten saiatu beharko genuke jakintza baita dugun gauzarik garrantzitsuena. " +
      "goizean jende askok trena hartzen du lanera joateko eta bidean albisteak irakurtzen ditu. " +
      "atzo arratsaldean ibaiertzean ibili ginen eta etorkizunerako gure asmoez hitz egin genuen. hotz egiten zuen baina zerua garbi zegoen eta izarrez beteta. nire ahizpak denda txiki batean lan egiten du geltokitik gertu eta bere lana asko gustatzen zaio."),
    "fa" -> ("روباه قهوه ای سریع از روی سگ تنبل می پرد. بهترین روزگار بود و مردم کتاب های زیادی درباره تاریخ و علم می خواندند. " +
      "بچه ها اغلب در پارک بازی می کنند در حالی که پدر و مادرشان با دقت زیاد آنها را تماشا می کنند. " +
      "ما باید هر روز تلاش کنیم چیز جدیدی یاد بگیریم زیرا دانش مهم ترین چیزی است که داریم. " +
      "صبح ها بسیاری از مردم با قطار به سر کار می روند و در راه اخبار را می خوانند. " +
      "دیشب کنار رودخانه قدم زدیم و درباره برنامه هایمان برای آینده صحبت کردیم. هوا سرد بود اما آسمان صاف و پر از ستاره بود. خواهر من در یک مغازه کوچک نزدیک ایستگاه کار می کند و کارش را خیلی دوست دارد."),
    "he" -> ("השועל החום המהיר קופץ מעל הכלב העצלן. אלה היו הזמנים הטובים ביותר ואנשים קראו ספרים רבים על היסטוריה ומדע. " +
      "ילדים משחקים לעתים קרובות בפארק בזמן שהוריהם צופים בהם בתשומת לב רבה. " +
      "עלינו תמיד לנסות ללמוד משהו חדש בכל יום כי הידע הוא הדבר החשוב ביותר שיש לנו. " +
      "בבוקר אנשים רבים נוסעים ברכבת לעבודה וקוראים את החדשות בדרך. " +
      "אתמול בערב טיילנו לאורך הנהר ודיברנו על התוכניות שלנו לעתיד. היה קר אבל השמיים היו בהירים ומלאי כוכבים. אחותי עובדת בחנות קטנה ליד התחנה והיא מאוד אוהבת את העבודה שלה."),
    "hr" -> ("brza smeđa lisica skače preko lijenog psa. bila su to najbolja vremena i ljudi su čitali mnogo knjiga o povijesti i znanosti. " +
      "djeca se često igraju u parku dok ih roditelji promatraju s velikom pažnjom. " +
      "trebali bismo svaki dan pokušati naučiti nešto novo jer je znanje najvažnije što imamo. " +
      "ujutro mnogi ljudi putuju vlakom na posao i putem čitaju vijesti. " +
      "sinoć smo šetali uz rijeku i razgovarali o našim planovima za budućnost. bilo je hladno ali nebo je bilo vedro i puno zvijezda. moja sestra radi u maloj trgovini blizu kolodvora i jako voli svoj posao."),
    "lt" -> ("greita ruda lapė šokinėja per tingų šunį. tai buvo geriausi laikai ir žmonės skaitė daug knygų apie istoriją ir mokslą. " +
      "vaikai dažnai žaidžia parke o jų tėvai juos atidžiai stebi. " +
      "turėtume kasdien stengtis išmokti ką nors naujo nes žinios yra svarbiausia ką turime. " +
      "rytą daug žmonių važiuoja traukiniu į darbą ir kelyje skaito naujienas. " +
      "vakar vakare vaikščiojome palei upę ir kalbėjome apie savo ateities planus. buvo šalta bet dangus buvo giedras ir pilnas žvaigždžių. mano sesuo dirba mažoje parduotuvėje netoli stoties ir jai labai patinka jos darbas."),
    "lv" -> ("ātrā brūnā lapsa lec pāri slinkajam sunim. tie bija labākie laiki un cilvēki lasīja daudz grāmatu par vēsturi un zinātni. " +
      "bērni bieži spēlējas parkā kamēr viņu vecāki viņus vēro ar lielu uzmanību. " +
      "mums katru dienu vajadzētu censties iemācīties ko jaunu jo zināšanas ir vissvarīgākais kas mums ir. " +
      "no rīta daudzi cilvēki brauc ar vilcienu uz darbu un pa ceļam lasa ziņas. " +
      "vakar vakarā mēs pastaigājāmies gar upi un runājām par saviem nākotnes plāniem. bija auksts bet debesis bija skaidras un pilnas zvaigžņu. mana māsa strādā mazā veikalā netālu no stacijas un viņai ļoti patīk viņas darbs."),
    "sk" -> ("rýchla hnedá líška skáče cez lenivého psa. boli to najlepšie časy a ľudia čítali veľa kníh o histórii a vede. " +
      "deti sa často hrajú v parku zatiaľ čo ich rodičia ich pozorne sledujú. " +
      "mali by sme sa každý deň snažiť naučiť niečo nové pretože vedomosti sú to najdôležitejšie čo máme. " +
      "ráno veľa ľudí cestuje vlakom do práce a cestou si číta správy. " +
      "včera večer sme sa prechádzali popri rieke a rozprávali sa o našich plánoch do budúcnosti. bolo chladno ale obloha bola jasná a plná hviezd. moja sestra pracuje v malom obchode blízko stanice a jej práca sa jej veľmi páči. " +
      "každé ráno pijem kávu a čítam si noviny pri okne. náš dedko rozpráva dlhé príbehy o svojej mladosti a všetci ho radi počúvame. v zime padá sneh a deti stavajú snehuliakov na dvore u starej mamy."),
    "sl" -> ("hitra rjava lisica skače čez lenega psa. bili so najboljši časi in ljudje so brali veliko knjig o zgodovini in znanosti. " +
      "otroci se pogosto igrajo v parku medtem ko jih starši pozorno opazujejo. " +
      "vsak dan bi se morali truditi naučiti nekaj novega saj je znanje najpomembnejše kar imamo. " +
      "zjutraj se veliko ljudi pelje z vlakom na delo in med potjo bere novice. " +
      "včeraj zvečer smo se sprehajali ob reki in se pogovarjali o naših načrtih za prihodnost. bilo je hladno vendar je bilo nebo jasno in polno zvezd. moja sestra dela v majhni trgovini blizu postaje in ima svoje delo zelo rada."),
    "sr" -> ("брза смеђа лисица скаче преко лењог пса. била су то најбоља времена и људи су читали много књига о историји и науци. " +
      "деца се често играју у парку док их родитељи посматрају са великом пажњом. " +
      "требало би сваког дана да покушамо да научимо нешто ново јер је знање најважније што имамо. " +
      "ујутру многи људи путују возом на посао и успут читају вести. " +
      "синоћ смо шетали поред реке и разговарали о нашим плановима за будућност. било је хладно али небо је било ведро и пуно звезда. моја сестра ради у малој продавници близу станице и веома воли свој посао."),
    "sw" -> ("mbweha mwepesi wa kahawia anaruka juu ya mbwa mvivu. ilikuwa nyakati bora zaidi na watu walisoma vitabu vingi kuhusu historia na sayansi. " +
      "watoto mara nyingi hucheza katika bustani huku wazazi wao wakiwatazama kwa makini sana. " +
      "tunapaswa kujaribu kujifunza kitu kipya kila siku kwa sababu maarifa ndiyo kitu muhimu zaidi tulicho nacho. " +
      "asubuhi watu wengi husafiri kwa treni kwenda kazini na kusoma habari njiani. " +
      "jana jioni tulitembea kando ya mto na kuzungumza kuhusu mipango yetu ya baadaye. kulikuwa na baridi lakini anga ilikuwa safi na imejaa nyota. dada yangu anafanya kazi katika duka dogo karibu na kituo na anapenda kazi yake sana."),
    "ta" -> ("வேகமான பழுப்பு நரி சோம்பேறி நாயின் மேல் குதிக்கிறது. அது சிறந்த காலம் அப்போது மக்கள் வரலாறு மற்றும் அறிவியல் பற்றி பல புத்தகங்களைப் படித்தார்கள். " +
      "குழந்தைகள் அடிக்கடி பூங்காவில் விளையாடுகிறார்கள் அவர்களின் பெற்றோர்கள் அவர்களை மிகுந்த கவனத்துடன் பார்க்கிறார்கள். " +
      "அறிவு நம்மிடம் உள்ள மிக முக்கியமான விஷயம் என்பதால் ஒவ்வொரு நாளும் புதிதாக ஏதாவது கற்றுக்கொள்ள முயற்சிக்க வேண்டும். " +
      "காலையில் பலர் ரயிலில் வேலைக்குச் சென்று வழியில் செய்திகளைப் படிக்கிறார்கள். " +
      "நேற்று மாலை நாங்கள் ஆற்றங்கரையில் நடந்து எதிர்காலத் திட்டங்களைப் பற்றி பேசினோம். குளிராக இருந்தது ஆனால் வானம் தெளிவாகவும் நட்சத்திரங்கள் நிறைந்ததாகவும் இருந்தது. என் சகோதரி நிலையத்திற்கு அருகில் ஒரு சிறிய கடையில் வேலை செய்கிறாள் அவள் தன் வேலையை மிகவும் விரும்புகிறாள்."),
    "th" -> ("สุนัขจิ้งจอกสีน้ำตาลที่ว่องไวกระโดดข้ามสุนัขขี้เกียจ มันเป็นช่วงเวลาที่ดีที่สุดและผู้คนอ่านหนังสือมากมายเกี่ยวกับประวัติศาสตร์และวิทยาศาสตร์ " +
      "เด็กๆมักจะเล่นในสวนสาธารณะขณะที่พ่อแม่เฝ้าดูพวกเขาด้วยความใส่ใจอย่างมาก " +
      "เราควรพยายามเรียนรู้สิ่งใหม่ทุกวันเพราะความรู้คือสิ่งสำคัญที่สุดที่เรามี " +
      "ในตอนเช้าผู้คนจำนวนมากนั่งรถไฟไปทำงานและอ่านข่าวระหว่างทาง " +
      "เมื่อเย็นวานนี้เราเดินเล่นริมแม่น้ำและพูดคุยเกี่ยวกับแผนการในอนาคตของเรา อากาศหนาวแต่ท้องฟ้าแจ่มใสและเต็มไปด้วยดวงดาว น้องสาวของฉันทำงานในร้านเล็กๆใกล้สถานีและเธอชอบงานของเธอมาก")
  )

  /** The scorer's normalization, host-side: lowercase, everything that
    * is not a letter or a combining mark (`\p{M}` - Devanagari matras,
    * Arabic harakat, Vietnamese decomposed diacritics ride on their
    * base letter) to a space, collapse runs, trim. MUST stay in
    * lockstep with [[graft.ops.TextOps]]' column-side langNormalize;
    * both `\p{L}` and `\p{M}` spell and match identically in Java
    * regex and RE2, keeping the DuckDB replay byte-exact.
    */
  def normalize(s: String): String =
    s.toLowerCase.replaceAll("[^\\p{L}\\p{M}]", " ").replaceAll(" +", " ").trim

  /** All n-grams of size `n` (none when the string is shorter than n -
    * the scorer's per-size guard is identical).
    */
  def ngrams(s: String, n: Int): Seq[String] =
    if (s.length < n) Seq.empty
    else (0 to s.length - n).map(i => s.substring(i, i + n))

  /** 32-per-octave integer log code - identical to the SQL/codegen
    * `ilog32` used across the repo's integer-exact scorers.
    */
  def ilog32(x: Long): Long = {
    require(x > 0, s"ilog32 needs positive input, got $x")
    if (x < 32) x
    else {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
      (bl - 6).toLong * 32 + (x >> (bl - 6))
    }
  }

  /** Train and return (langs in alphabetical order, vocab gram ->
    * per-lang weights).
    */
  def train(): (Seq[String], Seq[(String, Seq[Long])]) = {
    val langs = seeds.keys.toSeq.sorted
    val counts: Map[String, Map[String, Long]] = langs.map { l =>
      val norm = normalize(seeds(l))
      l -> GRAM_SIZES.flatMap(n => ngrams(norm, n)).groupBy(identity)
        .map { case (g, os) => g -> os.size.toLong }
    }.toMap
    val vocab = langs.flatMap { l =>
      GRAM_SIZES.flatMap { n =>
        counts(l).toSeq.filter(_._1.length == n)
          .sortBy { case (g, c) => (-c, g) }.take(VOCAB_PER_SIZE).map(_._1)
      }
    }.distinct.sorted
    val vBySize: Map[Int, Long] =
      GRAM_SIZES.map(n => n -> vocab.count(_.length == n).toLong).toMap
    val totals: Map[(String, Int), Long] = (for {
      l <- langs; n <- GRAM_SIZES
    } yield (l, n) -> counts(l).collect {
      case (g, c) if g.length == n => c
    }.sum).toMap
    val table = vocab.map { g =>
      val n = g.length
      g -> langs.map { l =>
        ilog32(256L * (counts(l).getOrElse(g, 0L) + 1L)) -
          ilog32(256L * (totals((l, n)) + vBySize(n)))
      }
    }
    (langs, table)
  }

  def main(args: Array[String]): Unit = {
    val outFile = args(0)
    val (langs, table) = train()
    val body = table.map { case (g, ws) => s"$g\t${ws.mkString(",")}" }.mkString("\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile),
      s"#langs\t${langs.mkString(",")}\n$body\n")
    println(s"wrote ${table.size} trigram rows x ${langs.size} languages to $outFile")
  }
}
